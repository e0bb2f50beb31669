package graft

import graft.core.MFrame
import graft.operators.{FromTable, Annotate}
import graft.sources.Sinks
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

class MFrameSpec extends SparkSpec {
  import spark.implicits._

  lazy val df: DataFrame = Seq(
    ("genA", 1.0, 2.0, "coding"),
    ("genB", 3.0, 4.0, "linc")
  ).toDF("gene_stable_id", "s1", "s2", "biotype")

  test("select splits extra columns into metaRows (mdataframe.py:271-305 / S4)") {
    val mf = MFrame(df).select(Seq("s1", "s2"))
    assert(mf.data.columns.toSeq == Seq("gene_stable_id", "s1", "s2"))
    assert(mf.metaRows.get.columns.toSeq == Seq("gene_stable_id", "biotype"))
    assert(mf.valueColumns == Seq("s1", "s2"))
  }

  test("select with rows filters by index labels (P2)") {
    val mf = MFrame(df).select(Seq("s1"), rows = Some(Seq("genA")))
    assert(mf.data.count() == 1)
  }

  test("withMetaRows joins and dedups colliding names (J1 + U3, mdataframe.py:696-702)") {
    val meta = Seq(("genA", "x", 9.0), ("genB", "y", 8.0)).toDF("gene_stable_id", "note", "s1")
    val mf = MFrame(df).withMetaRows(meta)
    // s1 collides with a data column and must be dropped from meta
    assert(mf.metaRows.get.columns.toSeq == Seq("gene_stable_id", "note"))
  }

  test("full joins metaRows back (J4)") {
    val meta = Seq(("genA", "x"), ("genB", "y")).toDF("gene_stable_id", "note")
    val mf = MFrame(df).withMetaRows(meta)
    assert(mf.full.columns.contains("note"))
    assert(mf.full.count() == 2)
  }

  test("transform discards meta when the index disappears (mdataframe.py:688-692)") {
    val meta = Seq(("genA", "x")).toDF("gene_stable_id", "note")
    val mf = MFrame(df).withMetaRows(meta)
    val dropped = mf.transform(graft.core.Transformer("drop_index", Nil)(_.drop("gene_stable_id")))
    assert(dropped.metaRows.isEmpty)
  }

  test("transform modify-mask routes to data/metaRows/metaCols (mdataframe.py:590-676)") {
    val meta = Seq(("genA", "x"), ("genB", "y")).toDF("gene_stable_id", "note")
    val mcols = Seq(("s1", "batch1"), ("s2", "batch2")).toDF("sample", "batch")
    val mf = MFrame(df.select("gene_stable_id", "s1", "s2"))
      .withMetaRows(meta).withMetaCols(mcols)
    val upper = graft.core.Transformer("upper_strings", Nil) { d =>
      d.select(d.columns.map { c =>
        if (d.schema(c).dataType.typeName == "string" && c != "gene_stable_id" && c != "sample")
          org.apache.spark.sql.functions.upper(org.apache.spark.sql.functions.col(c)).as(c)
        else org.apache.spark.sql.functions.col(c)
      }.toSeq: _*)
    }
    // meta-only routing: data untouched, both meta frames transformed
    val metaOnly = mf.transform(upper, transformData = false,
      transformMetaRows = true, transformMetaCols = true)
    assert(metaOnly.data.collect().map(_.getDouble(1)).sorted.toSeq == Seq(1.0, 3.0))
    assert(metaOnly.metaRows.get.orderBy("gene_stable_id").collect()
      .map(_.getString(1)).toSeq == Seq("X", "Y"))
    assert(metaOnly.metaCols.get.orderBy("sample").collect()
      .map(_.getString(1)).toSeq == Seq("BATCH1", "BATCH2"))
    // default mask = data only (back-compat with single-arg transform)
    val dataOnly = mf.transform(upper)
    assert(dataOnly.metaRows.get.orderBy("gene_stable_id").collect()
      .map(_.getString(1)).toSeq == Seq("x", "y"))
    // index-dropping data transform still discards metaRows under a mask
    val dropIdx = graft.core.Transformer("drop_index", Nil)(_.drop("gene_stable_id"))
    assert(mf.transform(dropIdx, transformData = true,
      transformMetaRows = false).metaRows.isEmpty)
  }

  test("convenience wrappers: addMeta*/impute/scale defaults (mdataframe.py:727-763)") {
    val meta = Seq(("genA", "x"), ("genB", "y")).toDF("gene_stable_id", "note")
    val mcols = Seq(("s1", "b1"), ("s2", "b2")).toDF("sample", "batch")
    val mf = MFrame(df.select("gene_stable_id", "s1", "s2"))
      .withMetaRows(meta).withMetaCols(mcols)
    val upper = graft.core.Transformer("upper_strings", Nil) { d =>
      d.select(d.columns.map { c =>
        if (d.schema(c).dataType.typeName == "string" && c != "gene_stable_id" && c != "sample")
          org.apache.spark.sql.functions.upper(org.apache.spark.sql.functions.col(c)).as(c)
        else org.apache.spark.sql.functions.col(c)
      }.toSeq: _*)
    }
    // reference naming: add_meta_column augments meta-ROWS, add_meta_row meta-COLS
    val a = mf.addMetaColumn(upper)
    assert(a.metaRows.get.orderBy("gene_stable_id").collect()
      .map(_.getString(1)).toSeq == Seq("X", "Y"))
    assert(a.metaCols.get.orderBy("sample").collect()
      .map(_.getString(1)).toSeq == Seq("b1", "b2"))
    val b = mf.addMetaRow(upper)
    assert(b.metaRows.get.orderBy("gene_stable_id").collect()
      .map(_.getString(1)).toSeq == Seq("x", "y"))
    assert(b.metaCols.get.orderBy("sample").collect()
      .map(_.getString(1)).toSeq == Seq("B1", "B2"))
    assert(mf.addMeta(upper, axis = 1).metaCols.get.orderBy("sample").collect()
      .map(_.getString(1)).toSeq == Seq("B1", "B2"))

    // impute() default: NaN/NULL → 0
    val withNull = MFrame(Seq(("genA", Some(1.0)), ("genB", None: Option[Double]))
      .toDF("gene_stable_id", "s1"))
    assert(withNull.impute().data.orderBy("gene_stable_id").collect()
      .map(_.getDouble(1)).toSeq == Seq(1.0, 0.0))

    // scale() default: per-row population-std z-score (sklearn scale)
    val scaled = mf.scale().data.orderBy("gene_stable_id").collect()
    // row (1,2): mean 1.5, pop sd 0.5 → (-1, 1)
    assert(math.abs(scaled(0).getDouble(1) + 1.0) < 1e-12 &&
      math.abs(scaled(0).getDouble(2) - 1.0) < 1e-12)
  }

  test("FromTable annotator validates columns and fills (mbf_compliance.py:69-91 / J3)") {
    val anno = Seq(("genA", "chr1")).toDF("gid", "chr")
    val out = FromTable(anno, Seq("chr"), "gene_stable_id", "gid", fill = Some("NA"))(df)
    val chrs = out.orderBy("gene_stable_id").collect().map(_.getAs[String]("chr")).toSeq
    assert(chrs == Seq("chr1", "NA"))
    intercept[IllegalArgumentException] {
      FromTable(anno, Seq("nope"), "gene_stable_id", "gid")(df)
    }
  }

  test("clusterLabels fills unmatched rows with -1 (J2, mdataframe.py:801-807)") {
    val labels = Seq(("genA", 2)).toDF("gene_stable_id", "cl")
    val out = Annotate.clusterLabels(labels, "cl")(df)
    val m = out.collect().map(r => r.getString(0) -> r.getAs[Double]("cl")).toMap
    assert(m == Map("genA" -> 2.0, "genB" -> -1.0))
  }

  test("TSV sink writes ONE tab-separated file with header (mdataframe.py:925-949 / S6)") {
    val tmp = Files.createTempDirectory("graft-sink").toString
    val path = s"$tmp/out.tsv"
    Sinks.writeTsv(df.orderBy("gene_stable_id"), path)
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.head == "gene_stable_id\ts1\ts2\tbiotype")
    assert(lines.size == 3)
    assert(Files.isRegularFile(Paths.get(path)))
  }

  test("report sink emits data/meta sheets as files (S7 contract)") {
    val meta = Seq(("genA", "x")).toDF("gene_stable_id", "note")
    val mf = MFrame(df).withMetaRows(meta)
    val tmp = Files.createTempDirectory("graft-report").toString
    Sinks.writeReport(mf, s"$tmp/rep")
    assert(Files.exists(Paths.get(s"$tmp/rep/data.tsv")))
    assert(Files.exists(Paths.get(s"$tmp/rep/meta_rows.tsv")))
  }
}
