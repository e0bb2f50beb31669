package graft

import graft.operators.Profile
import graft.streaming.QualityMonitor
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val suite = Seq(
    Profile.NotNull("tag"),
    Profile.InRange("v", 0, 100))

  test("per-batch verdicts accumulate; bad batch flagged, clean batch passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Option[String], Double)]
    val dir = java.nio.file.Files.createTempDirectory("qmon").toString
    val ck = java.nio.file.Files.createTempDirectory("qmon_ck").toString

    var seen = List.empty[(Long, Boolean)]
    // batch 0: clean
    ms.addData((1L, Some("a"), 10.0), (2L, Some("b"), 20.0))
    val q = QualityMonitor.start(ms.toDF().toDF("id", "tag", "v"), suite,
      dir, ck, onVerdicts = (b, v) =>
        seen :+= (b, v.collect().forall(_.getBoolean(3))),
      trigger = Trigger.AvailableNow())
    q.processAllAvailable(); q.stop()
    // batch 1: null tag + out-of-range value
    ms.addData((3L, None, 10.0), (4L, Some("c"), 999.0))
    val q2 = QualityMonitor.start(ms.toDF().toDF("id", "tag", "v"), suite,
      dir, ck, onVerdicts = (b, v) =>
        seen :+= (b, v.collect().forall(_.getBoolean(3))),
      trigger = Trigger.AvailableNow())
    q2.processAllAvailable(); q2.stop()

    assert(seen == List((0L, true), (1L, false)))
    val verdicts = QualityMonitor.readVerdicts(spark, dir)
      .collect().map(r => (r.getLong(4), r.getString(0), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toList
    assert(verdicts == List(
      (0L, "tag", "not_null", 0L, true),
      (0L, "v", "in_range", 0L, true),
      (1L, "tag", "not_null", 1L, false),
      (1L, "v", "in_range", 1L, false)))
    val failed = QualityMonitor.failedBatches(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(failed == List((1L, 2L, 2L)))

    // replay idempotence: re-running batch 1's verdict write at its
    // owned path leaves the accumulated history unchanged
    Profile.check(Seq((3L, Option.empty[String], 10.0), (4L, Some("c"), 999.0))
        .toDF("id", "tag", "v"), suite)
      .withColumn("batch_id", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    val replayed = QualityMonitor.readVerdicts(spark, dir)
      .collect().map(r => (r.getLong(4), r.getString(0), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toList
    assert(replayed == verdicts)
  }

  test("gate suite parity: q_stream_quality runs the same check surface the monitor applies") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_stream_quality")(spark, dir).collect()
    assert(rows.length == 4)
    // the synthetic events table is clean by construction — a future
    // regen that breaks a constraint fails loud here, not in the gate
    assert(rows.forall(_.getBoolean(3)),
      rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).mkString(", "))
  }
}
