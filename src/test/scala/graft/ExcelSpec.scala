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
