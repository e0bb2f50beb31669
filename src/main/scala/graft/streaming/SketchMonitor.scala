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

  /** Exactly-once accumulation for SUM-merged sketches (count-min
    * counters, log-histograms) — these are NOT replay-idempotent, so
    * the store is a chain of VERSIONED snapshots: committing micro-batch
    * b writes the fully-merged frame to `storeDir/v<b>` (parquet's own
    * `_SUCCESS` is the commit marker). A replayed batch whose version
    * already committed is SKIPPED — never re-summed; a crash mid-write
    * left no `_SUCCESS`, so the deterministic rewrite merges the same
    * previous snapshot again. This is the canonical transactional
    * foreachBatch recipe, with the batch-id ledger folded into the
    * snapshot names. Old versions are pruned to `keepVersions`. */
  def startCmsMonitor(stream: DataFrame, valueCol: String,
      storeDir: String, checkpointDir: String,
      depth: Int = 4, widthPow: Int = 10,
      onCounters: DataFrame => Unit = _ => (),
      keepVersions: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        commitSumVersion(spark, storeDir, bid, keepVersions, prev => {
          val b = Sketches.cmsCounters(batch, valueCol, depth, widthPow)
          prev.fold(b)(p => Sketches.cmsMerge(p, b))
        })
        latestVersion(spark, storeDir).foreach(v =>
          onCounters(spark.read.parquet(v)))
      }
      .trigger(trigger)
      .start()

  /** [[startCmsMonitor]] for the log-histogram quantile sketch. */
  def startHistMonitor(stream: DataFrame, valueCol: String,
      groupCols: Seq[String], storeDir: String, checkpointDir: String,
      subBits: Int = 5,
      onHistogram: DataFrame => Unit = _ => (),
      keepVersions: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        commitSumVersion(spark, storeDir, bid, keepVersions, prev => {
          val b = Sketches.logHistogram(batch, valueCol, groupCols, subBits)
          prev.fold(b)(p => Sketches.histMerge(p, b, groupCols))
        })
        latestVersion(spark, storeDir).foreach(v =>
          onHistogram(spark.read.parquet(v)))
      }
      .trigger(trigger)
      .start()

  /** Commit one version: skip if `storeDir/v<batchId>/_SUCCESS` exists
    * (the replayed-batch case), else build the merged frame from the
    * latest committed snapshot and write it. Exposed for the replay
    * spec. */
  private[graft] def commitSumVersion(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      batchId: Long, keepVersions: Int,
      mkMerged: Option[DataFrame] => DataFrame): Boolean = {
    val vdir = s"$storeDir/v$batchId"
    if (exists(spark, s"$vdir/_SUCCESS")) return false
    val prev = latestVersion(spark, storeDir).map(spark.read.parquet(_))
    val merged = mkMerged(prev)
    pinAndSave(merged, _.write.mode("overwrite").parquet(vdir))
    pruneVersions(spark, storeDir, keepVersions)
    true
  }

  /** The newest `v<id>` snapshot with a `_SUCCESS` marker, if any. */
  private[graft] def latestVersion(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("v") && nm.drop(1).forall(_.isDigit) &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          Some(nm.drop(1).toLong -> st.getPath.toString)
        else None
      }
      .sortBy(_._1).lastOption.map(_._2)
  }

  private def pruneVersions(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, keep: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val committed = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("v") && nm.drop(1).forall(_.isDigit) &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          Some(nm.drop(1).toLong -> st.getPath)
        else None
      }
      .sortBy(_._1)
    committed.dropRight(keep).foreach { case (_, p) => fs.delete(p, true) }
  }

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
