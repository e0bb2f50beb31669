package graft

import graft.core.MFrame
import graft.operators.{SortDsl, SortStep}
import org.apache.spark.sql.DataFrame

/** Sort mini-language semantics (reference mdataframe.py:319-487). */
class SortDslSpec extends SparkSpec {
  import spark.implicits._

  lazy val df: DataFrame = Seq(
    ("a", 3.0, 1.0), ("b", 1.0, 2.0), ("c", 2.0, 2.0), ("d", 2.0, 0.0)
  ).toDF("gene_stable_id", "x", "y")

  private def order(d: DataFrame): Seq[String] =
    d.select("gene_stable_id").collect().map(_.getString(0)).toSeq

  test("parse: bare string key with bool/int modifiers") {
    assert(SortDsl.parse(Seq("x")) == Seq(SortStep(Seq("x"), 0, Seq(true))))
    assert(SortDsl.parse(Seq("x", false)) == Seq(SortStep(Seq("x"), 0, Seq(false))))
    assert(SortDsl.parse(Seq("x", 1, false)) == Seq(SortStep(Seq("x"), 1, Seq(false))))
  }

  test("parse: consecutive keys produce consecutive steps") {
    assert(SortDsl.parse(Seq("x", "y")) ==
      Seq(SortStep(Seq("x"), 0, Seq(true)), SortStep(Seq("y"), 0, Seq(true))))
  }

  test("parse: simultaneous list keys + ascending list") {
    assert(SortDsl.parse(Seq(Seq("x", "y"), Seq(false, true))) ==
      Seq(SortStep(Seq("x", "y"), 0, Seq(false, true))))
  }

  test("parse: [by, axis, ascending] triple applied consecutively") {
    assert(SortDsl.parse(Seq(Seq("x", 0, false), Seq("y", 0, true))) ==
      Seq(SortStep(Seq("x"), 0, Seq(false)), SortStep(Seq("y"), 0, Seq(true))))
  }

  test("parse: mismatched ascending list length raises") {
    intercept[IllegalArgumentException] {
      SortDsl.parse(Seq(Seq("x", "y"), Seq(false, true, false))).foreach(_.asc)
    }
    intercept[IllegalArgumentException] { SortDsl.parse(Seq(42.0)) }
  }

  test("simultaneous multi-key sort orders by priority (mdataframe.py:410-448)") {
    val sorted = SortDsl.sortRows(df, SortDsl.parse(Seq(Seq("x", "y"), Seq(true, false))))
    assert(order(sorted) == Seq("b", "c", "d", "a"))
  }

  test("consecutive sorts: last dominates, earlier breaks ties") {
    val sorted = SortDsl.sortRows(df, SortDsl.parse(Seq("x", false, "y")))
    // last sort y asc dominates; ties in y broken by earlier x desc
    assert(order(sorted) == Seq("d", "a", "c", "b"))
  }

  test("axis=1 column reorder by a row's values (mdataframe.py:449-468 / O2)") {
    val sorted = SortDsl.sortColumns(df, "gene_stable_id", SortStep(Seq("a"), 1, Seq(true)))
    assert(sorted.columns.toSeq == Seq("gene_stable_id", "y", "x")) // row a: y=1 < x=3
    val desc = SortDsl.sortColumns(df, "gene_stable_id", SortStep(Seq("a"), 1, Seq(false)))
    assert(desc.columns.toSeq == Seq("gene_stable_id", "x", "y"))
  }

  test("meta-resident sort keys are joined in and dropped (mdataframe.py:430-448)") {
    val meta = Seq(("a", 2L), ("b", 0L), ("c", 3L), ("d", 1L)).toDF("gene_stable_id", "prio")
    val mf = MFrame(df, metaRows = Some(meta))
    val sorted = SortDsl.sort(mf, "prio")
    assert(order(sorted.data) == Seq("b", "d", "a", "c"))
    assert(!sorted.data.columns.contains("prio"))
  }

  test("unknown sort key raises") {
    intercept[IllegalArgumentException] { SortDsl.sort(MFrame(df), "nope") }
  }

  test("computed key: (name, Column) sorts by a derived expression (mdataframe.py:339-348)") {
    import org.apache.spark.sql.functions.col
    // single computed step: x+y descending — a=4, c=4, b=3, d=2, and the
    // a/c tie resolves via the consecutive "x" sort (last dominates, the
    // computed step becomes the tiebreaker): x asc = b(1), c(2), d(2), a(3),
    // c before d on the x tie because x+y desc has c=4 > d=2
    val sorted = SortDsl.transformer(("xy", col("x") + col("y")), false, "x")(df)
    assert(order(sorted) == Seq("b", "c", "d", "a"))
    // MFrame path: computed keys need no column in data or meta
    val viaMf = SortDsl.sort(MFrame(df), ("neg_y", col("y") * -1), "x")
    assert(order(viaMf.data) == Seq("b", "c", "d", "a"))
    assert(!viaMf.data.columns.exists(_.contains("neg_y")))
  }
}
