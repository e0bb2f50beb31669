package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the harness `events` table —
  * north-star extension (the reference has no streaming; SURVEY.md §2.11).
  *
  * Each operator is defined ONCE as a DataFrame transform and applied to
  * either a batch frame or a `readStream` frame — Structured Streaming's
  * unified-API contract. Batch equivalence is what the driver's oracle
  * checks (date_trunc windows are epoch-aligned in both engines); the
  * streaming path is exercised with a file source + memory sink in
  * StreamingSpec.
  *
  * Scale: all aggregations are keyed by (window, type) or user — shuffle
  * partitions bounded by key cardinality; watermarks bound state size
  * (late data beyond 10 minutes is dropped, so state per window is
  * finite); stateful session windows use flatMapGroupsWithState with
  * event-time timeout so idle users are evicted.
  */
object EventStream {

  /** Raw file schema with `ts` as nanosecond longs — the layout older
    * harness testdata used (see Tables.events; newer data stores micros
    * timestamps directly, which readStream detects from the file). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events as a stream (file source over the same parquet; the single
    * parquet file is globbed since a stream source needs a directory).
    * A file stream needs a declared schema, so the actual schema (the ts
    * physical type varies across harness versions) is sniffed with a batch
    * read of the same file; normalizeTs then handles either layout. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeTs(
      spark.readStream.schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Tumbling 1-hour windows per event type: count + exact decimal sum.
    * On a stream, prepend `withWatermark("ts", "10 minutes")`. */
  def tumblingCounts(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sliding windows (1 hour, sliding 30 min) per type. */
  def slidingCounts(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
  }

  /** Watermark-scoped dedup on event_id (exactly-once repair): on a
    * stream `dropDuplicates` keeps state only inside the watermark. */
  def dedupEvents(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "10 minutes") else events
    src.dropDuplicates("event_id")
  }

  /** Session windows per user with a 30-minute gap — expressed with the
    * built-in `session_window` (state pruned by the watermark). */
  def sessionize(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
  }

  /** `value` rides as exact decimal so the running total is independent
    * of per-group iteration order (the dsum recipe — a Double
    * accumulator would make the emitted total depend on row order
    * inside each micro-batch and flake any exact comparison). */
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: java.math.BigDecimal)
  final case class UserRunning(user_id: Long, n: Long, total: java.math.BigDecimal)

  /** Custom state machine: running per-user totals via
    * flatMapGroupsWithState (the KeyValueGroupedDataset path the reference
    * lacks entirely) — demonstrates arbitrary stateful processing with
    * EVENT-TIME timeout eviction: a user idle for `idleGapMs` of event time
    * beyond the watermark has its state removed, so per-user state on an
    * unbounded stream is bounded by the active-user set, not the all-time
    * user set. A user returning after eviction restarts from zero (the
    * semantics of evicting a running total). On a batch frame timeouts
    * never fire (single batch) and the operator degrades to one total per
    * user. */
  def runningUserTotals(spark: SparkSession, events: DataFrame,
      idleGapMs: Long = 30L * 60 * 1000): DataFrame = {
    import spark.implicits._
    val gapMs = idleGapMs
    // EventTimeTimeout requires a watermark on streaming input
    val src = if (events.isStreaming) events.withWatermark("ts", "10 minutes") else events
    val ds = src.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"),
      col("value").cast(DecimalType(18, 2)).as("value")).as[Ev]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            // idle user: totals were already emitted on the last update;
            // drop the state so it cannot accumulate forever
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              UserRunning(uid, 0L, java.math.BigDecimal.ZERO))
            var n = prev.n; var total = prev.total
            var lastTs = Long.MinValue
            rows.foreach { e =>
              n += 1; total = total.add(e.value)
              if (e.ts.getTime > lastTs) lastTs = e.ts.getTime
            }
            val next = UserRunning(uid, n, total)
            state.update(next)
            // evict once the watermark passes idleGap beyond this user's
            // newest event (batch mode ignores the timestamp)
            if (lastTs != Long.MinValue) state.setTimeoutTimestamp(lastTs + gapMs)
            Iterator(next)
          }
      }.toDF()
      // exact decimal inside the state; one deterministic double out
      .withColumn("total", col("total").cast("double"))
  }

  /** Start a streaming tumbling-count query into a named memory sink. */
  def startTumblingQuery(spark: SparkSession, dir: String, name: String): StreamingQuery =
    tumblingCounts(readStream(spark, dir), watermarked = true)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-stream INTERVAL join: attribute each purchase to every click
    * by the same user in the preceding hour — the canonical two-stream
    * correlation shape (here two filtered views of one stream, which
    * Structured Streaming plans as a genuine stream-stream join).
    *
    * State-boundedness: on a stream BOTH sides carry watermarks and the
    * join predicate is an event-time RANGE, so Spark derives a state
    * watermark per side and evicts buffered rows once they can no longer
    * match (clicks after watermark + 1 hour, purchases after the
    * watermark) — state is O(traffic within watermark + interval), not
    * O(stream history). Without the range predicate a stream-stream join
    * would buffer forever; that is the design rule this operator
    * demonstrates. Works identically on batch frames (oracle-checked as
    * q_stream_join). */
  def attributedPurchases(events: DataFrame, watermarked: Boolean = false): DataFrame = {
    def wm(df: DataFrame) = if (watermarked) df.withWatermark("ts", "10 minutes") else df
    val clicks = wm(events).where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = wm(events).where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Stream-static enrichment: join the (streaming) events against a
    * static dimension on `user_id`, then windowed per-segment counts —
    * the standard "enrich the stream with a dim table" pipeline shape.
    * The static side is broadcast per micro-batch by the planner; at
    * scale a slowly-changing dim would be a Delta/parquet path re-read
    * per batch. Works identically on a batch frame (tests + oracle). */
  def enrichedCounts(events: DataFrame, userDim: DataFrame,
      watermarked: Boolean = false): DataFrame = {
    val src = if (watermarked) events.withWatermark("ts", "10 minutes") else events
    src.join(broadcast(userDim), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("unknown")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("segment"), col("n_events"))
  }
}
