package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Profile

/** Streaming data-quality gate: run a [[graft.operators.Profile]]
  * constraint suite on every arriving micro-batch and append the
  * verdicts to a store — the admission-control screen that catches a
  * poisoned feed BEFORE it reaches the corpus (a schema drift or a
  * null-flood shows up as a failed batch verdict, not as a corrupted
  * downstream table).
  *
  * Replay contract (the at-least-once failure mode of foreachBatch):
  * batch b's verdicts land under the batch-OWNED path `batch=<b>`,
  * overwritten whole — [[Profile.check]] is deterministic in the batch
  * content, so a replayed batch rewrites exactly its own directory
  * with identical content and the accumulated verdict history can
  * never double-count (the startTokenizedExport ownership pattern).
  *
  * Scale shape: per batch this is [[Profile.check]]'s single
  * aggregation over a single scan; the stored verdicts are
  * constraints-sized rows per batch — the store grows with batch
  * count, never with data volume. */
object QualityMonitor {

  /** Start the monitor. `onVerdicts` fires after each batch commits
    * with (batchId, that batch's verdict frame) — wire alerting or a
    * quarantine decision there (e.g. divert the batch when any
    * `passed == false`). */
  def start(stream: DataFrame, constraints: Seq[Profile.Constraint],
      storeDir: String, checkpointDir: String,
      onVerdicts: (Long, DataFrame) => Unit = (_, _) => (),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, b: Long) =>
        val verdicts = Profile.check(batch, constraints)
          .withColumn("batch_id", lit(b))
        verdicts.write.mode("overwrite").parquet(s"$storeDir/batch=$b")
        onVerdicts(b, verdicts)
      }
      .trigger(trigger)
      .start()

  /** Every verdict recorded so far: (column, constraint, violations,
    * passed, batch_id). */
  def readVerdicts(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/batch=*")
      .orderBy("batch_id", "column", "constraint")

  /** Batches with at least one failed constraint — the quarantine
    * list. */
  def failedBatches(spark: SparkSession, storeDir: String): DataFrame =
    readVerdicts(spark, storeDir)
      .where(!col("passed"))
      .groupBy("batch_id")
      .agg(sum(col("violations")).as("total_violations"),
        count(lit(1)).as("failed_constraints"))
      .orderBy("batch_id")
}
