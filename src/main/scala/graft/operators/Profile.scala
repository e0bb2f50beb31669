package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality profiling and declarative constraint
  * checking — the "unit tests for data" layer (the Deequ/TFDV idea,
  * Schelter et al., VLDB 2018) a 100 TB ingest pipeline runs before
  * admitting a batch.
  *
  * Scale contract: BOTH entry points compute every requested measure in
  * ONE aggregation over ONE scan — column stats and all constraint
  * verdicts come back from a single job whose partial aggregates are
  * map-side combined; nothing is ever re-scanned per column or per
  * constraint (the naive per-check loop is a plan-count linear in
  * checks — the one shape that does not survive a 100 TB table). The
  * only post-aggregate work is exploding the single result row into
  * per-column/per-constraint rows.
  *
  * Exact-distinct counts use Spark's multi-count-distinct EXPAND
  * rewrite — still one scan, with data duplicated per distinct-column
  * inside the exchange. For very wide profile requests at extreme
  * scale, profile fewer columns per pass or swap in the mergeable
  * [[Sketches]] HLL registers; the constraint path has no such term.
  */
object Profile {

  /** A declarative column constraint; `violations` is the number of
    * rows breaking it (never the row content — safe to log). */
  sealed trait Constraint {
    def column: String

    /** stable machine label (gate/report key) */
    def label: String

    /** the single aggregate expression counting violations */
    private[operators] def agg: Column
  }

  /** Column must contain no NULLs. */
  final case class NotNull(column: String) extends Constraint {
    val label = "not_null"
    private[operators] def agg: Column =
      coalesce(sum(when(col(column).isNull, 1L).otherwise(0L)), lit(0L))
  }

  /** Every non-NULL value appears at most once (NULLs are ignored —
    * pair with [[NotNull]] for a primary-key check). Violations =
    * surplus duplicate rows beyond the first of each value. */
  final case class Unique(column: String) extends Constraint {
    val label = "unique"
    private[operators] def agg: Column =
      count(col(column)) - countDistinct(col(column))
  }

  /** Non-NULL values must fall inside [lo, hi] (closed). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val label = "in_range"
    private[operators] def agg: Column =
      coalesce(sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L).otherwise(0L)), lit(0L))
  }

  /** Non-NULL values must be one of the given strings. */
  final case class InSet(column: String, values: Seq[String])
      extends Constraint {
    val label = "in_set"
    private[operators] def agg: Column =
      coalesce(sum(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1L).otherwise(0L)), lit(0L))
  }

  /** Non-NULL values must match the regex (keep patterns inside the
    * POSIX-class subset if a cross-engine replay must agree — Java
    * regex vs RE2 diverge on \s-style classes). */
  final case class Matches(column: String, regex: String)
      extends Constraint {
    val label = "matches"
    private[operators] def agg: Column =
      coalesce(sum(when(col(column).isNotNull &&
        !col(column).rlike(regex), 1L).otherwise(0L)), lit(0L))
  }

  /** Per-column profile: (column, n_rows, n_nulls, n_distinct, min_s,
    * max_s) — min/max as strings so one schema carries mixed column
    * types (callers needing typed extremes query the column directly).
    * One aggregation, one scan, however many columns. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.columns: no columns requested")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    row.select(explode(array(structs: _*)).as("r"))
      .select(col("r.column"), col("r.n_rows"), col("r.n_nulls"),
        col("r.n_distinct"), col("r.min_s"), col("r.max_s"))
      .orderBy("column")
  }

  /** Snapshot drift report: [[columns]] of `before` joined against
    * [[columns]] of `after` per column — the schema-drift / feed-health
    * diff a pipeline checks between ingest batches or dataset versions
    * (a null-flood shows as an n_nulls jump, an id-space change as an
    * n_distinct/min/max shift). Two single-scan profiles + a
    * columns-sized join. */
  def drift(before: DataFrame, after: DataFrame, cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      columns(df, cols).select(col("column"),
        col("n_rows").as(s"n_rows_$sfx"), col("n_nulls").as(s"n_nulls_$sfx"),
        col("n_distinct").as(s"n_distinct_$sfx"),
        col("min_s").as(s"min_$sfx"), col("max_s").as(s"max_$sfx"))
    side(before, "before").join(side(after, "after"), Seq("column"))
      .orderBy("column")
  }

  /** Per-group Tukey outlier fences over EXACT order-statistic
    * quartiles: q1/q3 are the elements at ranks ceil(n/4) / ceil(3n/4)
    * of the group's sorted non-null values — never interpolated, so the
    * fences `q1 - k*iqr` / `q3 + k*iqr` combine existing data values
    * with +,-,*,/ only and the outlier flag replays bit-exactly
    * cross-engine (k as the exact rational kNum/kDen, default 3/2).
    *
    * Shape: one per-group window rank (groups are the partition unit —
    * never a global sort), a groups-sized fence frame, and one
    * fence-join + rollup. Output: (group…, n, q1, q3, lo, hi,
    * n_outliers), ordered. */
  def iqrOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      kNum: Int = 3, kDen: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "iqrOutliers: need at least one group column")
    require(kDen > 0 && kNum >= 0, "iqrOutliers: fence factor must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(grp: _*)
    val nonNull = df.where(col(valueCol).isNotNull)
    val ranked = nonNull
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val fences = ranked.groupBy(grp: _*).agg(
        max(col("__n")).as("n"),
        max(when(col("__rn") === expr("(__n + 3) div 4"), col(valueCol))).as("q1"),
        max(when(col("__rn") === expr("(3 * __n + 3) div 4"), col(valueCol))).as("q3"))
      .withColumn("lo",
        col("q1") - lit(kNum) * (col("q3") - col("q1")) / lit(kDen))
      .withColumn("hi",
        col("q3") + lit(kNum) * (col("q3") - col("q1")) / lit(kDen))
    val counted = nonNull.join(fences, groupCols)
      .groupBy(grp: _*)
      .agg(coalesce(sum(when(col(valueCol) < col("lo") ||
        col(valueCol) > col("hi"), 1L).otherwise(0L)), lit(0L)).as("n_outliers"))
    fences.join(counted, groupCols)
      .select(grp ++ Seq(col("n"), col("q1"), col("q3"), col("lo"), col("hi"),
        col("n_outliers")): _*)
      .orderBy(grp: _*)
  }

  /** Run a constraint suite: (column, constraint, violations, passed),
    * all verdicts from ONE aggregation. Duplicate (column, label)
    * pairs are rejected — they would be indistinguishable downstream. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "Profile.check: empty constraint suite")
    val keys = constraints.map(c => (c.column, c.label))
    require(keys.distinct.length == keys.length,
      s"Profile.check: duplicate constraints for ${keys.diff(keys.distinct).distinct}")
    val aggs = constraints.zipWithIndex.map { case (c, i) => c.agg.as(s"__v$i") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = constraints.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.column).as("column"),
        lit(c.label).as("constraint"),
        col(s"__v$i").cast("long").as("violations"),
        (col(s"__v$i").cast("long") === 0L).as("passed"))
    }
    row.select(explode(array(structs: _*)).as("r"))
      .select(col("r.column"), col("r.constraint"), col("r.violations"),
        col("r.passed"))
      .orderBy("column", "constraint")
  }
}
