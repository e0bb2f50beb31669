package graft

import graft.operators.{CombinedFilter, Filter, FilterClause}
import org.apache.spark.sql.DataFrame

/** Mirrors the reference's filter truth tables 1:1
  * (reference: tests/test_filter.py:10-144, fixture test_frame2). */
class FilterSpec extends SparkSpec {
  import spark.implicits._

  /** test_frame2 (test_filter.py:10-20); pandas index → `idx` column. */
  lazy val frame: DataFrame = Seq(
    ("A", 2L, 0.1, "A", 3L),
    ("B", 1L, 0.001, "B", 2L),
    ("C", -9L, 0.4, "A", -8L),
    ("D", 0L, 0.2, "C", 0L)
  ).toDF("idx", "log", "fdr", "type", "cnt")

  private def surviving(f: graft.operators.FilterLike): Seq[String] =
    f(frame).select("idx").collect().map(_.getString(0)).toSeq.sorted

  test("init: name and clause round-trip (test_filter.py:23-26)") {
    val f = Filter(("log", "|>", 1))
    assert(f.name == "Filter")
    assert(f.clauses == Seq(FilterClause(Seq("log"), "|>", 1)))
  }

  test("abs-greater |> (test_filter.py:29-32, 101-104)") {
    assert(surviving(Filter(("log", "|>", 1))) == Seq("A", "C"))
    assert(surviving(Filter(("log", "|>", 0.9))) == Seq("A", "B", "C"))
  }

  test("> threshold (test_filter.py:35-38)") {
    assert(surviving(Filter(("log", ">", 0.9))) == Seq("A", "B"))
  }

  test(">= threshold (test_filter.py:41-44)") {
    assert(surviving(Filter(("log", ">=", 2))) == Seq("A"))
  }

  test("<= threshold (test_filter.py:47-50)") {
    assert(surviving(Filter(("log", "<=", -1))) == Seq("C"))
  }

  test("k-of-n quantifiers with >= (test_filter.py:53-62)") {
    assert(surviving(Filter((Seq("log", "cnt"), "1>=", 2))) == Seq("A", "B"))
    assert(surviving(Filter((Seq("log", "cnt"), "a>=", 2))) == Seq("A"))
    assert(surviving(Filter((Seq("log", "cnt", "fdr"), "2>=", 2))) == Seq("A"))
  }

  test("k-of-n quantifiers with > (test_filter.py:65-74)") {
    assert(surviving(Filter((Seq("log", "cnt"), "1>", 1.9))) == Seq("A", "B"))
    assert(surviving(Filter((Seq("log", "cnt"), "a>", 1.9))) == Seq("A"))
    assert(surviving(Filter((Seq("log", "cnt", "fdr"), "2>", 1.9999))) == Seq("A"))
  }

  test("k-of-n quantifiers with <= (test_filter.py:77-86)") {
    assert(surviving(Filter((Seq("log", "fdr"), "1<=", 0.05))) == Seq("B", "C", "D"))
    assert(surviving(Filter((Seq("log", "fdr"), "a<=", 0.3))) == Seq("D"))
    assert(surviving(Filter((Seq("log", "cnt", "fdr"), "2<=", 0))) == Seq("C", "D"))
  }

  test("k-of-n quantifiers with < (test_filter.py:89-98)") {
    assert(surviving(Filter((Seq("log", "cnt"), "1<", 1.0001))) == Seq("B", "C", "D"))
    assert(surviving(Filter((Seq("log", "cnt"), "a<", 0))) == Seq("C"))
    assert(surviving(Filter((Seq("log", "fdr", "cnt"), "2<", 0))) == Seq("C"))
  }

  test("clause conjunction (test_filter.py:107-110)") {
    assert(surviving(Filter(("log", ">", 0.5), ("fdr", "<", 0.2))) == Seq("A", "B"))
  }

  test("isin (test_filter.py:113-116)") {
    assert(surviving(Filter(("type", "in", Seq("A")))) == Seq("A", "C"))
  }

  test("notin keeps complement") {
    assert(surviving(Filter(("type", "notin", Seq("A")))) == Seq("B", "D"))
  }

  test("unknown operator raises (test_filter.py:119-121)") {
    intercept[IllegalArgumentException] { Filter(("type", "xxx", Seq("A"))) }
  }

  test("union combination via | (test_filter.py:124-128)") {
    val f = Filter(("log", ">", 1)) | Filter(("log", "<", -1))
    assert(surviving(f) == Seq("A", "C"))
  }

  test("bad combine operation raises (test_filter.py:131-138)") {
    val f = CombinedFilter(Filter(("log", ">", 1)), Filter(("log", "<", -1)), "not a pandas operation")
    intercept[IllegalArgumentException] { f(frame).collect() }
  }

  test("intersection combination via & (test_filter.py:141-144)") {
    val f = Filter(("log", ">", 0)) & Filter(("fdr", "<", 0.1))
    assert(surviving(f) == Seq("B"))
  }

  test("null semantics follow pandas: comparisons false, notin true") {
    val df = Seq(
      ("A", Some(2.0), Some("x")),
      ("B", None, None),
      ("C", Some(-3.0), Some("y"))
    ).toDF("idx", "v", "t")
    def ids(f: graft.operators.FilterLike) =
      f(df).select("idx").collect().map(_.getString(0)).toSeq.sorted
    assert(ids(Filter(("v", ">", 0))) == Seq("A"))
    assert(ids(Filter(("v", "|>", 1))) == Seq("A", "C"))
    assert(ids(Filter(("t", "in", Seq("x")))) == Seq("A"))
    assert(ids(Filter(("t", "notin", Seq("x")))) == Seq("B", "C"))
  }

  test("fingerprint: equal params equal hash, name excluded (test_transformations.py:18-23)") {
    val f1 = Filter(("log", ">", 1))
    val f2 = Filter(("log", ">", 1))
    val f3 = Filter(("log", ">", 2))
    assert(f1.fingerprint == f2.fingerprint)
    assert(f1.fingerprint != f3.fingerprint)
  }
}
