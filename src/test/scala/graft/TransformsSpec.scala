package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  /** conftest.py:44-57 test_frame, index column explicit. */
  lazy val counts: DataFrame = Seq(
    ("genA", 23L, 2L, 21L, 23L, 3L, 4L),
    ("genB", 12L, 14L, 14L, 4L, 4L, 5L),
    ("genC", 9L, 6L, 6L, 21L, 22L, 23L),
    ("genD", 40L, 80L, 80L, 90L, 90L, 80L)
  ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")

  private def rows(df: DataFrame): Map[String, Seq[Double]] =
    df.collect().map { r =>
      r.getString(r.fieldIndex("gene_stable_id")) ->
        df.columns.toSeq.filterNot(_ == "gene_stable_id").map(c => r.getAs[Number](c).doubleValue())
    }.toMap

  test("ImputeFixed replaces nulls and NaN with replacement (mdataframe.py:90-103)") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("c", Some(Double.NaN))).toDF("gene_stable_id", "v")
    val out = ImputeFixed()(df).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 1.0, "b" -> 0.0, "c" -> 0.0))
  }

  test("ImputeFixed with explicit missing value replaces only that value") {
    val df = Seq(("a", 1.0), ("b", -9.0)).toDF("gene_stable_id", "v")
    val out = ImputeFixed(Some(-9.0), 0.0)(df).collect().map(r => r.getDouble(1)).toSeq
    assert(out.sorted == Seq(0.0, 1.0))
  }

  test("ImputeStrategy mean/median/most_frequent fill (mdataframe.py:106-124)") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("c", Some(2.0)), ("d", Some(1.0)))
      .toDF("gene_stable_id", "v")
    def filled(s: String): Double =
      ImputeStrategy(s)(df).filter($"gene_stable_id" === "b").collect()(0).getDouble(1)
    assert(math.abs(filled("mean") - 4.0 / 3) < eps)
    assert(filled("median") == 1.0)
    assert(filled("most_frequent") == 1.0)
    intercept[IllegalArgumentException] { ImputeStrategy("nope") }
  }

  test("ImputeStrategy most_frequent single-pass mode: ties pick the smallest value, all-null columns fill 0.0") {
    val df = Seq(
      ("a", Some(2.0), Some(5.0), None: Option[Double]),
      ("b", Some(1.0), None, None: Option[Double]),
      ("c", Some(2.0), Some(5.0), None: Option[Double]),
      ("d", Some(1.0), Some(7.0), None: Option[Double]),
      ("e", None: Option[Double], Some(7.0), None: Option[Double]))
      .toDF("gene_stable_id", "x", "y", "z")
    val out = ImputeStrategy("most_frequent")(df)
    // x: 1.0 and 2.0 both appear twice — the tie picks the smallest
    assert(out.filter($"gene_stable_id" === "e").collect()(0).getDouble(1) == 1.0)
    // y: 5.0 and 7.0 both appear twice — same rule
    assert(out.filter($"gene_stable_id" === "b").collect()(0).getDouble(2) == 5.0)
    // z: no non-null values at all — falls back to 0.0
    assert(out.select("z").collect().forall(_.getDouble(0) == 0.0))
  }

  test("ZScale axis=0 standardizes each column with ddof=1 (ZScaler semantics)") {
    val out = rows(ZScale(axis = 0, ddof = 1)(counts))
    // sampleA_1 column: values 23,12,9,40  mean=21, sd=ddof1 sqrt(((23-21)^2+..)/3)
    val v = Seq(23.0, 12.0, 9.0, 40.0)
    val mean = v.sum / 4
    val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / 3)
    assert(math.abs(out("genA")(0) - (23.0 - mean) / sd) < eps)
    assert(math.abs(out("genD")(0) - (40.0 - mean) / sd) < eps)
  }

  test("ZScale axis=1 standardizes each row; ddof=0 matches sklearn scale default") {
    val out = rows(ZScale(axis = 1, ddof = 0)(counts))
    val v = Seq(23.0, 2.0, 21.0, 23.0, 3.0, 4.0) // genA row
    val mean = v.sum / 6
    val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / 6)
    assert(math.abs(out("genA")(0) - (23.0 - mean) / sd) < eps)
  }

  test("ZScale constant column maps to zero (mdataframe.py:152 guard)") {
    val df = Seq(("a", 5.0, 1.0), ("b", 5.0, 2.0)).toDF("gene_stable_id", "c1", "c2")
    val out = ZScale(axis = 0, ddof = 1)(df).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.0 && out("b") == 0.0)
  }

  test("Elementwise whitelist: abs/clip/add compile; unknown raises (mdataframe.py:523-533)") {
    val df = Seq(("a", -2.0)).toDF("gene_stable_id", "v")
    assert(Elementwise("abs")(df).collect()(0).getDouble(1) == 2.0)
    assert(Elementwise("clip", Seq(0.0, 1.0))(df).collect()(0).getDouble(1) == 0.0)
    assert(Elementwise("add", Seq(10.0))(df).collect()(0).getDouble(1) == 8.0)
    intercept[IllegalArgumentException] { Elementwise("no_such_method") }
  }

  test("Elementwise.custom applies a Column lambda to value columns only") {
    val df = Seq(("a", 3.0)).toDF("gene_stable_id", "v")
    val t = Elementwise.custom("double_it", c => c * 2)
    assert(t(df).collect()(0).getDouble(1) == 6.0)
  }

  test("Rename.rSafe prefixes X and converts dashes (transformations.py:115-118)") {
    val df = Seq((1.0, 2.0)).toDF("my-col", "other")
    assert(Rename.rSafe(df, protect = Nil).columns.toSeq == Seq("Xmy.col", "Xother"))
  }

  test("suffix contract: applied to value columns, index protected (transformations.py:52-57)") {
    val t = new graft.core.Transformer {
      val name = "S"
      override def suffix = Some(" (TMM)")
      def apply(df: DataFrame): DataFrame = applySuffix(df, protect = Seq("gene_stable_id"))
    }
    assert(t(counts).columns.toSeq.take(2) == Seq("gene_stable_id", "sampleA_1 (TMM)"))
  }
}
