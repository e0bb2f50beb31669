package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** As-of join semantics: backward inclusive match, left-join nulls,
  * multi-key grouping, and plan shape (one shuffle, no range join). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward inclusive match with left-join nulls") {
    val left = Seq(
      (1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 15L, "p15"), (1L, 25L, "p25"),
      (2L, 100L, "p100")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"),
      (3L, 1L, "zzz")).toDF("k", "t", "rv")
    val out = AsofJoin.backward(left, right, Seq("k"), "t")
      .select("k", "t", "lv", "rv_asof", "t_asof")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(out == Set(
      (1L, 5L, "p5", None, -1L),           // before any right row
      (1L, 10L, "p10", Some("a"), 10L),    // equal time: INCLUSIVE
      (1L, 15L, "p15", Some("a"), 10L),    // latest at-or-before
      (1L, 25L, "p25", Some("b"), 20L),
      (2L, 100L, "p100", None, -1L)))      // key with no right rows
  }

  test("multi-key as-of and right rows never leak across keys") {
    val left = Seq((1L, "x", 10L, 1.0), (1L, "y", 10L, 2.0)).toDF("k1", "k2", "t", "lv")
    val right = Seq((1L, "x", 5L, 0.5)).toDF("k1", "k2", "t", "rv")
    val out = AsofJoin.backward(left, right, Seq("k1", "k2"), "t")
      .select("k2", "rv_asof")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(out == Set(("x", Some(0.5)), ("y", None)))
  }

  test("null times/keys are null-rejecting, matching SQL ASOF") {
    // Spark sorts nulls FIRST ascending, so an unfiltered null-time right
    // row would read as "the earliest known value" and leak into every
    // left row with no real predecessor; SQL ASOF (r.t <= l.t, key
    // equality) can never match a null. Null-key right rows likewise must
    // not pair with null-key left rows (null = null is not true in SQL).
    val left = Seq(
      (Option(1L), Option(2L), "l2"),
      (Option(1L), Option(6L), "l6"),
      (Option(1L), Option.empty[Long], "lnullt"),
      (Option.empty[Long], Option(9L), "lnullk")).toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), Option.empty[Long], "rnullt"),
      (Option(1L), Option(5L), "r5"),
      (Option.empty[Long], Option(1L), "rnullk")).toDF("k", "t", "rv")
    val out = AsofJoin.backward(left, right, Seq("k"), "t")
      .select("lv", "rv_asof")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(
      ("l2", None),         // only r5 (later) and rnullt (never matches)
      ("l6", Some("r5")),
      ("lnullt", None),     // null left time matches nothing, row kept
      ("lnullk", None)))    // null key must not pair with rnullk
  }

  test("forward inclusive match mirrors backward") {
    val left = Seq(
      (1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 15L, "p15"), (1L, 25L, "p25"),
      (2L, 100L, "p100")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"),
      (3L, 1L, "zzz")).toDF("k", "t", "rv")
    val out = AsofJoin.forward(left, right, Seq("k"), "t")
      .select("k", "t", "lv", "rv_asof", "t_asof")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(out == Set(
      (1L, 5L, "p5", Some("a"), 10L),      // earliest at-or-after
      (1L, 10L, "p10", Some("a"), 10L),    // equal time: INCLUSIVE
      (1L, 15L, "p15", Some("b"), 20L),
      (1L, 25L, "p25", None, -1L),         // after every right row
      (2L, 100L, "p100", None, -1L)))
  }

  test("nearest picks the closer side, ties to backward") {
    val left = Seq(
      (1L, 4L, "near-a"),    // |4-10|=6 back none, fwd a@10 → a
      (1L, 14L, "tie"),      // back a@10 d=4, fwd b@18 d=4 → tie → backward a
      (1L, 17L, "near-b"),   // back a@10 d=7, fwd b@18 d=1 → b
      (1L, 30L, "after"),    // only backward b@18
      (2L, 1L, "lonely")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "a"), (1L, 18L, "b")).toDF("k", "t", "rv")
    val out = AsofJoin.nearest(left, right, Seq("k"), "t")
      .select("lv", "rv_asof")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out == Map(
      "near-a" -> Some("a"), "tie" -> Some("a"), "near-b" -> Some("b"),
      "after" -> Some("b"), "lonely" -> None))
  }

  test("forward/nearest: null left times stay unmatched (null-rejecting)") {
    // the descending scan puts null-time left rows AFTER every right row,
    // so without explicit masking they would leak the smallest right time
    val left = Seq((Option(1L), Option(5L), "ok"), (Option(1L), Option.empty[Long], "nullt"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "a")).toDF("k", "t", "rv")
    Seq(
      AsofJoin.forward(left, right, Seq("k"), "t"),
      AsofJoin.nearest(left, right, Seq("k"), "t")
    ).foreach { df =>
      val byLv = df.select("lv", "rv_asof").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(byLv("ok") == Some("a"))
      assert(byLv("nullt") == None, "null left time must not match")
    }
  }

  test("plan: forward and nearest still shuffle exactly once") {
    val left = Seq((1L, 5L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, 3L, "b")).toDF("k", "t", "rv")
    Seq(
      "forward" -> AsofJoin.forward(left, right, Seq("k"), "t"),
      "nearest" -> AsofJoin.nearest(left, right, Seq("k"), "t")
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Join"), s"$name: expected no join operator:\n$plan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles == 1, s"$name: expected one hash shuffle, got $shuffles:\n$plan")
    }
  }

  test("plan: single key shuffle, no join operator at all") {
    val left = Seq((1L, 5L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, 3L, "b")).toDF("k", "t", "rv")
    val plan = AsofJoin.backward(left, right, Seq("k"), "t")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"expected no join operator:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one hash shuffle, got $shuffles:\n$plan")
  }

  test("matches DuckDB-style semantics on the events fixture shape") {
    // mirror q_asof_join's structure on sf0.001 and sanity-check
    // monotonicity: every matched view_ts is <= its purchase ts
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"),
        col("value").as("purchase_value"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    val out = AsofJoin.backward(purchases, views, Seq("user_id"), "ts", "_view")
    assert(out.count() == purchases.count(), "as-of must preserve left cardinality")
    assert(out.where(col("ts_view") > col("ts")).count() == 0,
      "no future leakage: matched view must be at-or-before the purchase")
    assert(out.where(col("ts_view").isNotNull).count() > 0)
  }
}
