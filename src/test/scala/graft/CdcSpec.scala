package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)
  ).toDF("k", "v", "version")

  test("upsert, delete, insert and stale-change handling — hand-checked") {
    val changes = Seq(
      (1L, "a2", 1L, "U"), // update
      (2L, "x", 1L, "D"),  // tombstone
      (4L, "d", 1L, "U"),  // brand-new key (insert)
      (3L, "stale", -1L, "U") // older than the snapshot — must lose
    ).toDF("k", "v", "version", "op")
    val got = Cdc.applyChanges(snap, changes, Seq("k"), "version", Some("op"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List((1L, "a2", 1L), (3L, "c", 0L), (4L, "d", 1L)))
  }

  test("version tie: the change side wins") {
    val changes = Seq((1L, "tied", 0L, "U")).toDF("k", "v", "version", "op")
    val got = Cdc.applyChanges(snap, changes, Seq("k"), "version", Some("op"))
      .where(col("k") === 1L).collect()
    assert(got.head.getString(1) == "tied")
  }

  test("replayed change batch is idempotent") {
    val changes = Seq((1L, "a2", 1L, "U"), (2L, "x", 1L, "D"))
      .toDF("k", "v", "version", "op")
    val once = Cdc.applyChanges(snap, changes, Seq("k"), "version", Some("op"))
    val twice = Cdc.applyChanges(once, changes, Seq("k"), "version", Some("op"))
    val a = once.orderBy("k").collect().map(_.toSeq).toList
    val b = twice.orderBy("k").collect().map(_.toSeq).toList
    assert(a == b)
  }

  test("no op column: every change row is an upsert") {
    val changes = Seq((2L, "b2", 5L)).toDF("k", "v", "version")
    val got = Cdc.applyChanges(snap, changes, Seq("k"), "version")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List((1L, "a", 0L), (2L, "b2", 5L), (3L, "c", 0L)))
  }

  test("tombstone of an unseen key is a no-op on the survivors") {
    val changes = Seq((99L, "zz", 1L, "D")).toDF("k", "v", "version", "op")
    val got = Cdc.applyChanges(snap, changes, Seq("k"), "version", Some("op"))
      .orderBy("k").collect().map(_.getLong(0)).toList
    assert(got == List(1L, 2L, 3L))
  }
}
