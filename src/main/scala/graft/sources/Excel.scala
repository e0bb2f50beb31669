package graft.sources

import graft.core.MFrame
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Minimal xlsx reader/writer (reference S5 `FromFile(...).parse()` for
  * `.xlsx` tables, mbf_compliance.py:57-63, and S7 `MDF.write_excel`
  * with sheets data/meta_columns/meta_rows, mdataframe.py:951-973).
  *
  * xlsx is a zip of XML parts; this implements the subset those paths
  * need with JDK-only APIs (java.util.zip + StAX): inline/shared
  * strings, numeric cells, one sheet per frame. Excel I/O is a
  * DRIVER-side report surface in the reference (outputs are small
  * gene tables); the distributed path in and out stays parquet/TSV.
  */
object Excel {

  // ------------------------------ write ------------------------------

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def sheetXml(header: Seq[String], rows: Seq[Seq[Any]]): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def cell(ref: String, v: Any): String = v match {
      case null => ""
      case d: Double if d.isNaN || d.isInfinite =>
        s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>"""
      case n @ (_: Double | _: Float | _: Int | _: Long | _: Short | _: Byte |
                _: java.math.BigDecimal) =>
        s"""<c r="$ref"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>"""
    }
    sb ++= s"""<row r="1">"""
    header.zipWithIndex.foreach { case (h, c) => sb ++= cell(colRef(c) + "1", h) }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (r, i) =>
      sb ++= s"""<row r="${i + 2}">"""
      r.zipWithIndex.foreach { case (v, c) => sb ++= cell(colRef(c) + (i + 2), v) }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  /** Write DataFrames as sheets of one xlsx (driver-side collect —
    * report-sized outputs only, like the reference's). */
  def writeXlsx(filename: String, sheets: Seq[(String, DataFrame)]): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(filename)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val n = sheets.size
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString + "</Types>")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((nm, _), i) =>
          s"""<sheet name="${xmlEscape(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString + "</Relationships>")
    sheets.zipWithIndex.foreach { case ((_, df), i) =>
      val header = df.columns.toSeq
      val rows = df.collect().toSeq.map(_.toSeq)
      put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(header, rows))
    }
    zos.close()
  }

  /** S7 `MDF.write_excel(full=)`: sheets data (+ meta_columns, meta_rows). */
  def writeExcel(mf: MFrame, filename: String, full: Boolean = true): Unit = {
    val sheets = ArrayBuffer("data" -> mf.data)
    if (full) {
      mf.metaCols.foreach(m => sheets += ("meta_columns" -> m))
      mf.metaRows.foreach(m => sheets += ("meta_rows" -> m))
    }
    writeXlsx(filename, sheets.toSeq)
  }

  // ------------------------------- read ------------------------------

  private def parseSharedStrings(zf: ZipFile): IndexedSeq[String] = {
    val e = zf.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val out = ArrayBuffer.empty[String]
    val rd = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(zf.getInputStream(e))
    var cur: StringBuilder = null
    var inT = false
    while (rd.hasNext) {
      rd.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          cur ++= rd.getText
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "si" => out += cur.toString
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  private def colIndex(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    n - 1
  }

  /** Read the first sheet of an xlsx into (header row, data rows of
    * Option[String] cells). */
  def readSheet(path: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val zf = new ZipFile(path)
    try {
      val shared = parseSharedStrings(zf)
      val sheetEntry = {
        val names = zf.entries()
        var best: java.util.zip.ZipEntry = null
        while (names.hasMoreElements) {
          val e = names.nextElement()
          if (e.getName.matches("xl/worksheets/sheet1\\.xml") ||
            (best == null && e.getName.matches("xl/worksheets/sheet\\d+\\.xml")))
            best = e
        }
        require(best != null, s"$path contains no worksheet")
        best
      }
      val rd = javax.xml.stream.XMLInputFactory.newInstance()
        .createXMLStreamReader(zf.getInputStream(sheetEntry))
      val rows = ArrayBuffer.empty[ArrayBuffer[(Int, String)]]
      var curRow: ArrayBuffer[(Int, String)] = null
      var cellRef: String = null
      var cellType: String = null
      var inV = false
      var inT = false
      val buf = new StringBuilder
      while (rd.hasNext) {
        rd.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            rd.getLocalName match {
              case "row" => curRow = ArrayBuffer.empty
              case "c" =>
                cellRef = rd.getAttributeValue(null, "r")
                cellType = Option(rd.getAttributeValue(null, "t")).getOrElse("n")
              case "v" => inV = true; buf.clear()
              case "t" => inT = true; buf.clear()
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inT =>
            buf ++= rd.getText
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            rd.getLocalName match {
              case "row" => rows += curRow; curRow = null
              case "v" =>
                inV = false
                val raw = buf.toString
                val value = if (cellType == "s") shared(raw.trim.toInt) else raw
                curRow += ((colIndex(cellRef), value))
              case "t" =>
                inT = false
                if (cellType == "inlineStr") curRow += ((colIndex(cellRef), buf.toString))
              case _ =>
            }
          case _ =>
        }
      }
      val width = (rows.map(r => if (r.isEmpty) 0 else r.map(_._1).max + 1) :+ 0).max
      val dense = rows.map { r =>
        val arr = Array.fill[Option[String]](width)(None)
        r.foreach { case (c, v) => arr(c) = Some(v) }
        arr.toSeq
      }
      if (dense.isEmpty) (Seq.empty, Seq.empty)
      else (dense.head.map(_.getOrElse("")), dense.tail.toSeq)
    } finally zf.close()
  }

  /** S5 `FromFile(...).parse()` for xlsx: first sheet → DataFrame with a
    * header row; columns where every non-empty cell parses numeric become
    * DoubleType (pandas read_excel-style inference), others StringType. */
  def readXlsx(spark: SparkSession, path: String): DataFrame =
    inferFrame(spark, readSheet(path))

  /** S5 for legacy `.xls` (BIFF8): same contract, [[Biff]] reader. */
  def readXls(spark: SparkSession, path: String): DataFrame =
    inferFrame(spark, Biff.readSheet(path))

  /** S7 analog for .xls: sheets data (+ meta_columns, meta_rows). */
  def writeExcelXls(mf: MFrame, filename: String, full: Boolean = true): Unit = {
    val sheets = ArrayBuffer("data" -> mf.data)
    if (full) {
      mf.metaCols.foreach(m => sheets += ("meta_columns" -> m))
      mf.metaRows.foreach(m => sheets += ("meta_rows" -> m))
    }
    Biff.writeXls(filename, sheets.toSeq)
  }

  /** Shared pandas-style inference from a (header, string cells) sheet. */
  private def inferFrame(spark: SparkSession,
      sheet: (Seq[String], Seq[Seq[Option[String]]])): DataFrame = {
    val (header, rows) = sheet
    val numeric = header.indices.map { c =>
      val vals = rows.flatMap(_(c))
      vals.nonEmpty && vals.forall(v => scala.util.Try(v.toDouble).isSuccess)
    }
    val schema = StructType(header.zipWithIndex.map { case (h, c) =>
      StructField(h, if (numeric(c)) DoubleType else StringType, nullable = true)
    })
    val data = rows.map { r =>
      Row.fromSeq(header.indices.map { c =>
        r(c) match {
          case Some(v) if numeric(c) => v.toDouble
          case Some(v) => v
          case None => null
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }
}
