package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (2L, None, 60.0),
    (3L, Some("a"), -5.0),
    (4L, Some("zz"), 30.0)
  ).toDF("id", "tag", "v")

  test("columns: one-pass stats per column") {
    val got = Profile.columns(df, Seq("id", "tag", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toList
    assert(got == List(
      ("id", 5L, 0L, 4L, "1", "4"),
      ("tag", 5L, 1L, 3L, "a", "zz"),
      ("v", 5L, 0L, 5L, "-5.0", "60.0")))
  }

  test("columns is a single aggregation (one scan, no per-column jobs)") {
    val plan = Profile.columns(df, Seq("id", "tag", "v"))
      .queryExecution.optimizedPlan.toString
    // one Aggregate chain over one relation: the relation must appear
    // exactly once in the optimized plan (no self-union of scans)
    val scans = "LocalRelation|Relation".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one scan, plan:\n$plan")
  }

  test("check: verdicts for every constraint from one pass") {
    val got = Profile.check(df, Seq(
      Profile.NotNull("tag"),
      Profile.Unique("id"),
      Profile.InRange("v", 0, 50),
      Profile.InSet("tag", Seq("a", "b")),
      Profile.Matches("tag", "^[a-y]+$")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toList
    assert(got == List(
      ("id", "unique", 1L, false),        // id=2 twice
      ("tag", "in_set", 1L, false),       // zz
      ("tag", "matches", 1L, false),      // zz
      ("tag", "not_null", 1L, false),     // one null
      ("v", "in_range", 2L, false)))      // -5 and 60
  }

  test("check: all-green suite and null handling") {
    val got = Profile.check(df, Seq(
      Profile.NotNull("id"),
      Profile.InRange("id", 1, 4),
      Profile.InSet("tag", Seq("a", "b", "zz")), // nulls ignored
      Profile.Matches("tag", "^[a-z]+$")))
      .collect()
    assert(got.forall(_.getBoolean(3)))
    assert(got.forall(_.getLong(2) == 0L))
  }

  test("check on an empty frame: zero violations, all pass") {
    val empty = df.where(lit(false))
    val got = Profile.check(empty, Seq(
      Profile.NotNull("id"), Profile.Unique("id"),
      Profile.InRange("v", 0, 1)))
      .collect()
    assert(got.length == 3)
    assert(got.forall(r => r.getLong(2) == 0L && r.getBoolean(3)))
  }

  test("duplicate constraint keys are rejected") {
    intercept[IllegalArgumentException] {
      Profile.check(df, Seq(Profile.NotNull("id"), Profile.NotNull("id")))
    }
  }

  test("drift: null flood and row drop surface per column") {
    val after = df.where(col("id") =!= 2L)
      .withColumn("tag", lit(null).cast("string"))
    val got = Profile.drift(df, after, Seq("id", "tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(6), r.getLong(7), r.getLong(8))).toList
    // (column, n_rows_b, n_nulls_b, n_distinct_b, n_rows_a, n_nulls_a, n_distinct_a)
    assert(got == List(
      ("id", 5L, 0L, 4L, 3L, 0L, 3L),
      ("tag", 5L, 1L, 3L, 3L, 3L, 0L)))
  }

  test("iqrOutliers: hand-checked order-statistic quartiles and fence counts") {
    // group a: sorted values 1..8 plus outlier 100 -> n=9,
    // q1 = rank ceil(9/4)=3 -> 3.0, q3 = rank ceil(27/4)=7 -> 7.0,
    // iqr=4, lo=3-6=-3, hi=7+6=13 -> one outlier (100)
    val d = ((1 to 8).map(v => ("a", v.toDouble)) :+ ("a", 100.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0)) // constant group: iqr 0, no outliers
    val got = Profile.iqrOutliers(d.toDF("g", "v"), "v", Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toList
    assert(got == List(
      ("a", 9L, 3.0, 7.0, -3.0, 13.0, 1L),
      ("b", 3L, 5.0, 5.0, 5.0, 5.0, 0L)))
  }

  test("iqrOutliers: nulls ignored, fences use only non-null ranks") {
    val d = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", None)).toDF("g", "v")
    val got = Profile.iqrOutliers(d, "v", Seq("g")).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 4L) // n excludes the null
  }
}
