package graft

import org.apache.spark.sql.functions._
import graft.core.MFrame
import graft.sources.Excel

/** xlsx source/sink (reference S5 FromFile-xlsx parse and S7
  * MDF.write_excel, mbf_compliance.py:57-63 / mdataframe.py:951-973):
  * round-trip through our own writer/reader, sheet layout contract. */
class ExcelSpec extends SparkSpec {

  def sampleDf = {
    import spark.implicits._
    Seq(
      ("genA", 1.5, 10L, "coding & <odd> \"chars\""),
      ("genB", -2.25, 20L, "simple"),
      ("genC", 0.0, 30L, "ünïcødé")
    ).toDF("gene_stable_id", "score", "count", "note")
  }

  test("write → read round-trip preserves values and inferred types") {
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("t.xlsx").toString
    Excel.writeXlsx(path, Seq("data" -> sampleDf))
    val back = Excel.readXlsx(spark, path)
    assert(back.columns.toSeq == Seq("gene_stable_id", "score", "count", "note"))
    assert(back.schema("score").dataType.typeName == "double")
    assert(back.schema("count").dataType.typeName == "double") // numeric inference
    assert(back.schema("note").dataType.typeName == "string")
    val rows = back.orderBy("gene_stable_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "genA")
    assert(rows(0).getDouble(1) == 1.5)
    assert(rows(0).getDouble(2) == 10.0)
    assert(rows(0).getString(3) == "coding & <odd> \"chars\"")
    assert(rows(2).getString(3) == "ünïcødé")
  }

  test("write_excel(full) emits data/meta_columns/meta_rows sheets") {
    import spark.implicits._
    val meta = Seq(("genA", "chr1"), ("genB", "chr2"), ("genC", "chrX"))
      .toDF("gene_stable_id", "chromosome")
    val mf = MFrame(sampleDf.select("gene_stable_id", "score"), index = "gene_stable_id")
      .withMetaRows(meta)
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("mf.xlsx").toString
    Excel.writeExcel(mf, path, full = true)
    // sheet inventory straight from the zip
    val zf = new java.util.zip.ZipFile(path)
    val entries = {
      val b = Set.newBuilder[String]
      val e = zf.entries()
      while (e.hasMoreElements) b += e.nextElement().getName
      b.result()
    }
    zf.close()
    assert(entries.contains("xl/worksheets/sheet1.xml"))
    assert(entries.contains("xl/worksheets/sheet2.xml")) // meta_rows (no metaCols set)
    // first sheet is the data block
    val back = Excel.readXlsx(spark, path)
    assert(back.columns.toSeq == Seq("gene_stable_id", "score"))
    assert(back.count() == 3)
  }

  test("fromFile detects tsv/csv/json/xlsx formats (S5 parse)") {
    import graft.operators.Annotate
    val dir = java.nio.file.Files.createTempDirectory("fromfile")
    def write(name: String, content: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p, content)
      p.toString
    }
    val tsv = write("a.tsv", "gid\tscore\ngenA\t1.5\ngenB\t2.5\n")
    val csv = write("a.csv", "gid,score\ngenA,1.5\ngenB,2.5\n")
    val json = write("a.json", """{"gid":"genA","score":1.5}""" + "\n" +
      """{"gid":"genB","score":2.5}""" + "\n")
    val xlsx = dir.resolve("a.xlsx").toString
    import spark.implicits._
    Excel.writeXlsx(xlsx, Seq("t" -> Seq(("genA", 1.5), ("genB", 2.5)).toDF("gid", "score")))
    val xls = dir.resolve("a.xls").toString
    graft.sources.Biff.writeXls(xls, Seq("t" -> Seq(("genA", 1.5), ("genB", 2.5)).toDF("gid", "score")))
    Seq(tsv, csv, json, xlsx, xls).foreach { p =>
      val df = Annotate.fromFile(spark, p)
      assert(df.columns.sorted.toSeq == Seq("gid", "score"), p)
      val m = df.collect().map(r => r.getAs[String]("gid") ->
        r.getAs[Number]("score").doubleValue()).toMap
      assert(m == Map("genA" -> 1.5, "genB" -> 2.5), p)
    }
  }

  test(".xls (BIFF8) round-trip: ministream container, strings + numbers + unicode") {
    val path = java.nio.file.Files.createTempDirectory("xls").resolve("t.xls").toString
    graft.sources.Biff.writeXls(path, Seq("data" -> sampleDf))
    // a small workbook stream must use the CFB ministream (< 4096 bytes)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val back = Excel.readXls(spark, path)
    assert(back.columns.toSeq == Seq("gene_stable_id", "score", "count", "note"))
    assert(back.schema("score").dataType.typeName == "double")
    assert(back.schema("note").dataType.typeName == "string")
    val rows = back.orderBy("gene_stable_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "genA")
    assert(rows(0).getDouble(1) == 1.5)
    assert(rows(0).getDouble(2) == 10.0)
    assert(rows(0).getString(3) == "coding & <odd> \"chars\"")
    assert(rows(2).getString(3) == "ünïcødé") // UTF-16 SST entry
    assert(bytes.length >= 512 + 512) // header + at least one sector
  }

  test(".xls round-trip: regular-sector container past the 4096 cutoff") {
    import spark.implicits._
    // 400 rows × 3 cols ≈ 12 KB of NUMBER/LABELSST records → regular FAT
    val big = (0 until 400).map(i => (s"gene_$i", i * 1.5, s"note_$i"))
      .toDF("gid", "score", "note")
    val path = java.nio.file.Files.createTempDirectory("xls").resolve("big.xls").toString
    graft.sources.Biff.writeXls(path, Seq("data" -> big))
    val back = Excel.readXls(spark, path).orderBy(length(col("gid")), col("gid")).collect()
    assert(back.length == 400)
    assert(back(0).getString(0) == "gene_0" && back(0).getDouble(1) == 0.0)
    assert(back(399).getString(0) == "gene_399" && back(399).getString(2) == "note_399")
  }

  test(".xls SST continuation: >64KB of shared strings split across CONTINUE records") {
    import spark.implicits._
    // 3000 distinct ~30-char strings ≈ 100 KB of SST payload — without
    // CONTINUE splitting the u16 record length wraps and corrupts the file
    val big = (0 until 3000).map(i => (i.toDouble, s"annotation_value_number_$i${"x" * 12}"))
      .toDF("k", "label")
    val path = java.nio.file.Files.createTempDirectory("xls").resolve("sst.xls").toString
    graft.sources.Biff.writeXls(path, Seq("data" -> big))
    val back = Excel.readXls(spark, path).orderBy("k").collect()
    assert(back.length == 3000)
    assert(back(0).getString(1) == s"annotation_value_number_0${"x" * 12}")
    assert(back(2999).getString(1) == s"annotation_value_number_2999${"x" * 12}")
    assert(back.map(_.getString(1)).distinct.length == 3000)
  }

  test(".xls multi-sheet write keeps the data sheet first (write_excel analog)") {
    import spark.implicits._
    val meta = Seq(("genA", "chr1"), ("genB", "chr2"), ("genC", "chrX"))
      .toDF("gene_stable_id", "chromosome")
    val mf = MFrame(sampleDf.select("gene_stable_id", "score"), index = "gene_stable_id")
      .withMetaRows(meta)
    val path = java.nio.file.Files.createTempDirectory("xls").resolve("mf.xls").toString
    Excel.writeExcelXls(mf, path, full = true)
    val back = Excel.readXls(spark, path)
    assert(back.columns.toSeq == Seq("gene_stable_id", "score"))
    assert(back.count() == 3)
  }

  test("annotation join from an xlsx table (S5 FromFile path)") {
    import spark.implicits._
    val table = Seq(("genA", "TP53"), ("genB", "BRCA1")).toDF("gid", "symbol")
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("ann.xlsx").toString
    Excel.writeXlsx(path, Seq("ann" -> table))
    val ann = Excel.readXlsx(spark, path)
    val joined = graft.operators.FromTable(ann, Seq("symbol"),
      indexColumnTarget = "gene_stable_id", indexColumnTable = "gid")(sampleDf)
    val got = joined.select("gene_stable_id", "symbol").orderBy("gene_stable_id")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(got == Seq(("genA", Some("TP53")), ("genB", Some("BRCA1")), ("genC", None)))
  }
}
