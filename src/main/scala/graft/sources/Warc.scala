package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}

/** WARC (ISO 28500) source — the container format of web crawls
  * (Common Crawl, Internet Archive): a stream of records, each a
  * CRLF-terminated header block (`WARC/1.x` version line + `Name: value`
  * fields) followed by exactly `Content-Length` payload bytes and a
  * blank-line separator. This is the raw-ingest front door of an LLM
  * data pipeline; downstream the payloads feed the JSONL/text curation
  * operators ([[Jsonl]], [[graft.operators.Dedup]], the quality
  * kernels).
  *
  * Scale shape: `spark.sparkContext.binaryFiles` → one task per WARC
  * file, records streamed one at a time with bounded memory (a record's
  * payload is the only buffered unit). One-task-per-file IS the
  * standard parallelism grain of crawl processing — crawls ship as
  * millions of ~1 GB part files, so file-level parallelism saturates
  * any cluster without needing a record-splittable input format (and
  * `.warc.gz` files are member-per-record gzip, which is NOT
  * block-splittable anyway — GZIPInputStream's transparent member
  * chaining handles them in the same streaming pass).
  *
  * Schema: (file, record_ix, warc_type, target_uri, date, content_type,
  * content_length, payload binary). Header names are case-insensitive
  * per the spec; unknown fields are ignored; a malformed record raises
  * with file/record context rather than silently truncating the corpus
  * (quarantine belongs at the payload-parse stage, where [[Jsonl]]
  * style screening applies).
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_ix", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Read every record of every matched WARC file (plain or .warc.gz). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      val raw: InputStream = pds.open()
      val in = new DataInputStream(new BufferedInputStream(
        if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw) else raw))
      new Iterator[Row] {
        private var ix = 0L
        private var nextRec: Option[Row] = null // null = not fetched yet
        private def fetch(): Option[Row] = {
          readRecord(in, file, ix) match {
            case Some((tpe, uri, date, ctype, len, payload)) =>
              val r = Row(file, ix, tpe, uri, date, ctype, len, payload)
              ix += 1
              Some(r)
            case None => in.close(); None
          }
        }
        def hasNext: Boolean = {
          if (nextRec == null) nextRec = fetch()
          nextRec.isDefined
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextRec.get; nextRec = null; r
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** One record: (type, uri, date, content_type, length, payload), or
    * None at clean EOF. */
  private def readRecord(in: DataInputStream, file: String,
      ix: Long): Option[(String, String, String, String, Long, Array[Byte])] = {
    // skip inter-record blank lines, detect EOF on the version line
    var line = ""
    try {
      line = readLine(in)
      while (line != null && line.isEmpty) line = readLine(in)
    } catch { case _: EOFException => return None }
    if (line == null) return None
    require(line.startsWith("WARC/"),
      s"$file record $ix: expected WARC version line, got '${line.take(40)}'")
    var tpe: String = null; var uri: String = null; var date: String = null
    var ctype: String = null; var len: Long = -1L
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"$file record $ix: malformed header line '${h.take(40)}'")
      val name = h.substring(0, i).trim.toLowerCase
      val value = h.substring(i + 1).trim
      name match {
        case "warc-type" => tpe = value
        case "warc-target-uri" => uri = value
        case "warc-date" => date = value
        case "content-type" => ctype = value
        case "content-length" => len = value.toLong
        case _ => ()
      }
      h = readLine(in)
    }
    require(len >= 0, s"$file record $ix: missing Content-Length")
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    Some((tpe, uri, date, ctype, len, payload))
  }

  /** CRLF- or LF-terminated line as ISO-8859-1 (headers are ASCII per
    * spec; payload bytes are never routed through here). Returns null at
    * EOF before any byte. */
  private def readLine(in: DataInputStream): String = {
    val sb = new java.lang.StringBuilder
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = in.read()
    }
    sb.toString
  }

  /** Serialize records to WARC bytes (fixture/export helper — the
    * distributed write path of a crawl pipeline is the parquet sink;
    * WARC output exists for interop dumps). Each element:
    * (warc_type, target_uri, date, content_type, payload). */
  def recordBytes(records: Seq[(String, String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (tpe, uri, date, ctype, payload) =>
      val headers = new StringBuilder
      headers ++= "WARC/1.0\r\n"
      headers ++= s"WARC-Type: $tpe\r\n"
      if (uri != null) headers ++= s"WARC-Target-URI: $uri\r\n"
      if (date != null) headers ++= s"WARC-Date: $date\r\n"
      if (ctype != null) headers ++= s"Content-Type: $ctype\r\n"
      headers ++= s"Content-Length: ${payload.length}\r\n\r\n"
      out.write(headers.toString.getBytes("ISO-8859-1"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    out.toByteArray
  }
}
