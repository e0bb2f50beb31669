package graft

import java.nio.file.Files
import graft.sources.Warc

/** WARC source: record parse (plain + member-per-record gzip), header
  * case-insensitivity, payload byte fidelity, and loud failure on a
  * malformed stream. */
class WarcSpec extends SparkSpec {

  private def fixtureRecords = Seq(
    ("warcinfo", null: String, "2024-01-01T00:00:00Z", "application/warc-fields",
      "software: graft-test\r\n".getBytes("UTF-8")),
    ("response", "http://example.org/a", "2024-01-01T00:00:01Z", "text/html",
      "<html>hello &amp; bytes éè</html>".getBytes("UTF-8")),
    ("response", "http://example.org/b", "2024-01-01T00:00:02Z", "text/plain",
      Array.tabulate(256)(_.toByte)))

  private def writePlain(): String = {
    val f = Files.createTempFile("graft-warc", ".warc")
    Files.write(f, Warc.recordBytes(fixtureRecords))
    f.toString
  }

  test("parses records with types, uris, and byte-exact payloads") {
    val df = Warc.read(spark, writePlain())
    val rows = df.orderBy("record_ix").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "response", "response"))
    assert(rows(1).getAs[String]("target_uri") == "http://example.org/a")
    assert(rows(0).getAs[String]("target_uri") == null)
    assert(rows(1).getAs[String]("content_type") == "text/html")
    // byte fidelity including the full 0..255 range
    assert(rows(2).getAs[Array[Byte]]("payload").toSeq ==
      fixtureRecords(2)._5.toSeq)
    assert(rows(2).getAs[Long]("content_length") == 256L)
  }

  test("reads member-per-record gzip (.warc.gz) transparently") {
    val f = Files.createTempFile("graft-warc", ".warc.gz")
    val out = new java.io.FileOutputStream(f.toFile)
    // one gzip member per record — the Common Crawl layout
    fixtureRecords.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(Warc.recordBytes(Seq(r)))
      gz.finish()
    }
    out.close()
    val df = Warc.read(spark, f.toString)
    assert(df.count() == 3)
    assert(df.orderBy("record_ix").collect()(2)
      .getAs[Array[Byte]]("payload").toSeq == fixtureRecords(2)._5.toSeq)
  }

  test("header names are case-insensitive per ISO 28500") {
    val raw = ("WARC/1.0\r\nwarc-TYPE: response\r\nCONTENT-length: 2\r\n" +
      "WaRc-Target-Uri: http://x\r\n\r\nok\r\n\r\n").getBytes("ISO-8859-1")
    val f = Files.createTempFile("graft-warc", ".warc")
    Files.write(f, raw)
    val r = Warc.read(spark, f.toString).collect()(0)
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[String]("target_uri") == "http://x")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "ok")
  }

  test("malformed stream fails loudly with file context") {
    val f = Files.createTempFile("graft-warc", ".warc")
    Files.write(f, "NOT-A-WARC\r\njunk".getBytes("ISO-8859-1"))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, f.toString).count()
    }
    assert(e.getMessage.contains("WARC") || e.getCause != null)
  }
}
