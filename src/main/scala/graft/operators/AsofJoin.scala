package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the lookup primitive feature pipelines
  * need that Spark SQL lacks natively: for every left row, attach the
  * most recent right row with `right.time <= left.time` per key (the
  * "latest known value as of this moment" semantics; no leakage from the
  * future).
  *
  * Implementation is the scalable union-sort trick, NOT a range join:
  * tag both sides, union them, and run one window per key ordered by
  * (time, tag) taking the running `last` right payload (ignoreNulls) —
  * at equal timestamps the right row sorts first, so the match is
  * INCLUSIVE (`>=`), matching DuckDB/pandas `merge_asof` backward
  * semantics. Cost: ONE hash shuffle on the key plus a per-key sort —
  * linear in rows, independent of how many right rows precede each left
  * row. A naive `left JOIN right ON key AND r.t <= l.t` + argmax
  * explodes quadratically per key; a broadcast range join caps the right
  * side — this shape does neither and survives 100 TB with skew-bounded
  * keys.
  *
  * Left rows with no prior right row keep null payloads (left-join
  * semantics). Null handling matches SQL ASOF (`r.t <= l.t` and key
  * equality are null-rejecting): right rows with a null time or a null
  * key can never match and are dropped before the union — without that
  * filter Spark's NULLS-FIRST ascending sort would treat a null-time
  * right row as the earliest known value and leak it into every match.
  * Left rows with null time/keys pass through unmatched. Right payload
  * columns are suffixed into the output;
  * duplicate right rows at the same (key, time) are broken by the
  * pre-sort order of the union input — give the right side a
  * deterministic tiebreak column upstream if that case exists in your
  * data.
  */
object AsofJoin {

  /** Tag-and-union both sides for the window scan; returns the packed
    * union plus the right payload column names. Shared by all three
    * directions — the direction only changes the scan order. */
  private def packed(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String): (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val rPayloadCols = right.columns.filterNot(c => keys.contains(c)).toSeq
    require(rPayloadCols.nonEmpty, "right side has no payload columns")
    val rStructType = org.apache.spark.sql.types.StructType(
      rPayloadCols.map(c => right.schema(c)))

    val lPacked = left.select(
      keys.map(col) ++ Seq(
        col(timeCol).as("__t"),
        lit(1).as("__tag"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rStructType).as("__r")): _*)
    val rPacked = right
      .where((col(timeCol) +: keys.map(col)).map(_.isNotNull).reduce(_ && _))
      .select(
      keys.map(col) ++ Seq(
        col(timeCol).as("__t"),
        lit(0).as("__tag"),
        lit(null).cast(lPacked.schema("__l").dataType).as("__l"),
        struct(rPayloadCols.map(col): _*).as("__r")): _*)
    (lPacked.unionByName(rPacked), rPayloadCols)
  }

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, suffix: String = "_asof"): DataFrame = {
    val (u, rPayloadCols) = packed(left, right, keys, timeCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(col("__l.*") +: rPayloadCols.map(c => col(s"__m.$c").as(c + suffix)): _*)
  }

  /** Mirror of [[backward]]: attach the NEXT right row with
    * `right.time >= left.time` per key (inclusive — at equal timestamps
    * the right row wins, matching pandas `merge_asof`
    * direction="forward"). Same one-shuffle union-sort shape, scanned
    * from the future backwards: ordering by (time DESC, tag ASC) makes
    * each left row see the nearest not-earlier right row as the running
    * `last`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, suffix: String = "_asof"): DataFrame = {
    val (u, rPayloadCols) = packed(left, right, keys, timeCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null left times must stay unmatched (`r.t >= l.t` is
    // null-rejecting); unlike the backward scan, where NULLS-FIRST
    // ascending makes that fall out naturally, the descending scan puts
    // null-time left rows AFTER every right row — mask them explicitly
    u.withColumn("__m", when(col("__t").isNotNull,
        last(col("__r"), ignoreNulls = true).over(w)))
      .where(col("__tag") === 1)
      .select(col("__l.*") +: rPayloadCols.map(c => col(s"__m.$c").as(c + suffix)): _*)
  }

  /** Nearest-in-time match: the closer of the [[backward]] and
    * [[forward]] candidates, ties preferring backward (the no-leakage
    * side). STILL one key shuffle: both direction scans are windows over
    * the same partitioning, so Catalyst reuses the exchange and only
    * re-sorts (time ASC then DESC) within partitions.
    *
    * Distances compare in EXACT integer units on integer-like axes —
    * `unix_micros` for timestamps, `unix_date` for dates, a long cast
    * for integral columns — so a backward/forward tie in integer micros
    * can never flip to the forward match through float rounding (a
    * double cast of a timestamp is micros/1e6 with ~1.2e-7 s error per
    * cast). Float/double time axes compare as doubles, which is their
    * native exactness. The right side's time column must be part of its
    * payload (it is, unless dropped upstream) — it is how the match
    * distance is read. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, suffix: String = "_asof"): DataFrame = {
    val (u, rPayloadCols) = packed(left, right, keys, timeCol)
    require(rPayloadCols.contains(timeCol),
      s"nearest needs the right time column '$timeCol' in the payload")
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Column
    val exactAxis: Column => Column = u.schema("__t").dataType match {
      case _: TimestampType => unix_micros _
      // session-local shift is the same on both sides, distances unaffected
      case _: TimestampNTZType => (c: Column) => unix_micros(c.cast("timestamp"))
      case _: DateType => unix_date _
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        (c: Column) => c.cast("long")
      case _ => (c: Column) => c.cast("double")
    }
    val t = exactAxis(col("__t"))
    val tb = exactAxis(col(s"__mb.$timeCol"))
    val tf = exactAxis(col(s"__mf.$timeCol"))
    // same null-left-time masking as [[forward]] (the backward scan is
    // naturally safe, but masking both keeps the rule explicit)
    u.withColumn("__mb", when(col("__t").isNotNull,
        last(col("__r"), ignoreNulls = true).over(wb)))
      .withColumn("__mf", when(col("__t").isNotNull,
        last(col("__r"), ignoreNulls = true).over(wf)))
      .where(col("__tag") === 1)
      .withColumn("__m",
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(t - tb <= tf - t, col("__mb"))
          .otherwise(col("__mf")))
      .select(col("__l.*") +: rPayloadCols.map(c => col(s"__m.$c").as(c + suffix)): _*)
  }
}
