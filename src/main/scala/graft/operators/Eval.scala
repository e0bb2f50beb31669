package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables.dsumWide

/** Classifier-evaluation metrics for the quality-model loop (fit →
  * score → THIS → adjust threshold → filter): per-threshold confusion
  * counts and reliability (calibration) bins. Everything that decides
  * a comparison is an exact integer count; the only floating point is
  * a final division of those counts (one op, identical expression tree
  * cross-engine), so the frames hash-gate with zero float trust.
  *
  * Scale shape: both reports are ONE aggregation over ONE scan
  * (thresholds/bins become conditional-sum columns, the Profile.check
  * shape) — output is thresholds- or bins-sized, never data-sized. */
object Eval {

  /** Per-threshold confusion counts + precision/recall/F1. A row
    * scores positive at threshold t iff `score >= t`. Null scores or
    * labels are excluded (counted rows only). Precision is NULL at a
    * threshold that predicts nothing positive; recall is NULL when
    * there are no positives at all.
    *
    * Output: (threshold, tp, fp, fn, tn, precision, recall, f1),
    * ordered by threshold. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "Eval.prCurve: no thresholds")
    require(thresholds.distinct.length == thresholds.length,
      "Eval.prCurve: duplicate thresholds")
    val valid = col(scoreCol).isNotNull && col(labelCol).isNotNull
    val pos = col(labelCol) === 1
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      val pred = col(scoreCol) >= t
      Seq(
        coalesce(sum(when(valid && pred && pos, 1L).otherwise(0L)), lit(0L)).as(s"__tp$i"),
        coalesce(sum(when(valid && pred && !pos, 1L).otherwise(0L)), lit(0L)).as(s"__fp$i"),
        coalesce(sum(when(valid && !pred && pos, 1L).otherwise(0L)), lit(0L)).as(s"__fn$i"),
        coalesce(sum(when(valid && !pred && !pos, 1L).otherwise(0L)), lit(0L)).as(s"__tn$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = thresholds.zipWithIndex.map { case (t, i) =>
      val tp = col(s"__tp$i"); val fp = col(s"__fp$i")
      val fn = col(s"__fn$i"); val tn = col(s"__tn$i")
      struct(
        lit(t).as("threshold"),
        tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"),
        when(tp + fp > 0, tp.cast("double") / (tp + fp).cast("double"))
          .as("precision"),
        when(tp + fn > 0, tp.cast("double") / (tp + fn).cast("double"))
          .as("recall"),
        when(lit(2L) * tp + fp + fn > 0,
          (lit(2L) * tp).cast("double") / (lit(2L) * tp + fp + fn).cast("double"))
          .as("f1"))
    }
    row.select(explode(array(structs: _*)).as("r")).select(col("r.*"))
      .orderBy("threshold")
  }

  /** Reliability (calibration) bins: scores in [0, 1] bucketed into
    * `bins` equal-width bins (scores == 1.0 land in the last bin), per
    * bin the row count, positive count, decimal-exact mean score and
    * the positive fraction — a well-calibrated model has
    * mean_score ≈ frac_pos per bin. Empty bins are omitted.
    *
    * Output: (bin, n, n_pos, mean_score, frac_pos), ordered. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, "Eval.calibration: bins must be >= 1")
    val valid = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
    valid
      .withColumn("__bin",
        least(floor(col(scoreCol) * bins).cast("long"), lit(bins.toLong - 1)))
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col(labelCol) === 1, 1L).otherwise(0L)), lit(0L)).as("n_pos"),
        (dsumWide(col(scoreCol)) / count(lit(1)).cast("double")).as("mean_score"))
      .withColumn("frac_pos",
        col("n_pos").cast("double") / col("n").cast("double"))
      .orderBy("bin")
  }
}
