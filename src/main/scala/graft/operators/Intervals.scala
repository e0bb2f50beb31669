package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-overlap) joins — the genomics workhorse behind the
  * reference's domain (feature × read overlap; cf. BEDTools/ADAM's
  * region joins) and the generic "which events fall inside which
  * windows" query.
  *
  * Spark has no band-join physical operator: a raw range-predicate
  * join plans as BroadcastNestedLoop (or worse, cartesian) — quadratic
  * work that no cluster survives at 100 TB. The scale shape here is
  * BIN PROMOTION: replicate each interval to the fixed-width bins it
  * touches, equi-join on the bin key (shuffle hash / sort-merge — the
  * plan Catalyst is good at), refine with the exact overlap predicate
  * inside matched bins, and emit each pair exactly once WITHOUT a
  * distinct: only the bin containing max(lStart, rStart) — the first
  * bin the pair shares — reports it. Replication factor =
  * len/binSize + 1 per interval; tune `binSize` toward the typical
  * interval length so the factor stays O(1), and bin-key skew is
  * bounded by per-bin occupancy, not by the longest interval.
  */
object Intervals {

  /** Overlap join on half-open intervals [start, end): pairs where
    * `lStart < rEnd && rStart < lEnd`.
    *
    * Inputs must have disjoint column names (pre-alias); rows with
    * empty intervals (end <= start) cannot overlap anything and are
    * dropped. Coordinates must be non-negative integers (genomic/
    * token/byte offsets — floor-div binning assumes it; enforced).
    *
    * Output: all left columns, then all right columns, then
    * `overlap_len` = min(ends) - max(starts) (> 0 by construction).
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, "overlapJoin: binSize must be positive")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"overlapJoin: column collision on $dup — pre-alias")

    def binned(df: DataFrame, s: String, e: String, bin: String) =
      df.where(col(e) > col(s) && col(s) >= 0)
        .withColumn(bin,
          explode(sequence(
            expr(s"$s div $binSize"),
            expr(s"($e - 1) div $binSize"))))

    val lb = binned(left, lStart, lEnd, "__lbin")
    val rb = binned(right, rStart, rEnd, "__rbin")
    lb.join(rb,
        col("__lbin") === col("__rbin") &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          // exactly-once: only the first shared bin reports the pair
          col("__lbin") === expr(s"greatest($lStart, $rStart) div $binSize"))
      .withColumn("overlap_len",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
      .drop("__lbin", "__rbin")
  }

  /** Per-right-interval coverage: how many left intervals overlap each
    * right row (0-covered rows included). The overlap join aggregated
    * on the right key — one extra map-side-combined shuffle. */
  def coverageCount(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      rKey: String, binSize: Long): DataFrame = {
    val hits = overlapJoin(left, right, lStart, lEnd, rStart, rEnd, binSize)
      .groupBy(col(rKey)).agg(count(lit(1)).as("n_overlaps"))
    right.select(col(rKey)).distinct()
      .join(hits, Seq(rKey), "left")
      .select(col(rKey), coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy(rKey)
  }
}
