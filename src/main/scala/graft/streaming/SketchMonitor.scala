package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Sketches

/** Streaming corpus-growth monitoring: accumulate a cardinality /
  * set-similarity sketch of an arriving stream into a persisted store,
  * micro-batch by micro-batch, and surface the running estimates.
  *
  * Why this is exactly-once WITHOUT dedup bookkeeping: both HLL
  * registers (bucket-wise max) and KMV signatures (k-min set union) are
  * IDEMPOTENT under re-insertion, so a replayed micro-batch (the
  * at-least-once failure mode of foreachBatch) merges to the identical
  * store — the estimate can never double-count. A count-min monitor is
  * deliberately NOT offered here: CMS merges by SUM, so a replay would
  * silently inflate counts; accumulate CMS only under an
  * exactly-once-committed sink.
  *
  * Scale shape: the store is bounded by sketch geometry (≤ 2^p register
  * rows or ≤ k signature slots per group), so each batch pins the merged
  * frame on the driver before overwriting — the overwrite never reads
  * its own input files, and "driver-sized" is guaranteed by the sketch,
  * not by hoping the data is small. */
object SketchMonitor {

  /** Accumulate an HLL sketch of `valueCol` (grouped by `groupCols`)
    * into `storeDir`; after each batch, `onEstimate` receives the
    * running per-group estimate frame. */
  def startHllMonitor(stream: DataFrame, valueCol: String,
      groupCols: Seq[String], storeDir: String, checkpointDir: String,
      p: Int = 10, onEstimate: DataFrame => Unit = _ => (),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val batchStore = Sketches.HllStore(
          Sketches.hllRegisters(batch, valueCol, groupCols, p), p, groupCols)
        val merged =
          if (exists(spark, s"$storeDir/meta"))
            Sketches.loadHll(spark, storeDir).merge(batchStore)
          else batchStore
        pinAndSave(merged.regs, st => Sketches.HllStore(st, p, groupCols).save(storeDir))
        onEstimate(Sketches.loadHll(spark, storeDir).estimate)
      }
      .trigger(trigger)
      .start()

  /** Accumulate a KMV sketch — same contract; the running store also
    * serves pairwise group-overlap (Jaccard) queries via
    * [[Sketches.kmvJaccardCol]] without ever re-reading the stream. */
  def startKmvMonitor(stream: DataFrame, valueCol: String,
      groupCols: Seq[String], storeDir: String, checkpointDir: String,
      k: Int = 256, onSignatures: DataFrame => Unit = _ => (),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val batchStore = Sketches.KmvStore(
          Sketches.kmvSketch(batch, valueCol, groupCols, k), k, groupCols)
        val merged =
          if (exists(spark, s"$storeDir/meta"))
            Sketches.loadKmv(spark, storeDir).merge(batchStore)
          else batchStore
        pinAndSave(merged.sigs, st => Sketches.KmvStore(st, k, groupCols).save(storeDir))
        onSignatures(Sketches.loadKmv(spark, storeDir).sigs)
      }
      .trigger(trigger)
      .start()

  private def exists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Collect the (geometry-bounded) sketch frame to the driver, then
    * save the pinned copy — the overwrite must never lazily read the
    * files it is replacing. */
  private def pinAndSave(frame: DataFrame, save: DataFrame => Unit): Unit = {
    val spark = frame.sparkSession
    val rows = frame.collect().toSeq
    val pinned = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), frame.schema)
    save(pinned)
  }
}
