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
      binSize: Long, extraKeys: Seq[(String, String)] = Nil): DataFrame = {
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
    // extraKeys (e.g. the chromosome/group axis) join as additional
    // equi-conditions, keeping candidate pairs group-local when many
    // groups share one coordinate space
    val keyCond = extraKeys.map { case (a, b) => col(a) === col(b) }
      .foldLeft(col("__lbin") === col("__rbin"))(_ && _)
    lb.join(rb,
        keyCond &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          // exactly-once: only the first shared bin reports the pair
          col("__lbin") === expr(s"greatest($lStart, $rStart) div $binSize"))
      .withColumn("overlap_len",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
      .drop("__lbin", "__rbin")
  }

  /** Merge overlapping or touching intervals per group (the BEDTools
    * `merge` op — collapse features per chromosome): output one row per
    * maximal run of intervals whose union is contiguous, with the run's
    * span and member count. Half-open semantics: [1,5) and [5,9) touch
    * and merge.
    *
    * Shape: one shuffle to the group key, then a per-group window scan
    * (running max of predecessor ends → new-run flag → run id) and a
    * map-side-combined rollup. Groups are chromosomes/shards — the
    * per-group sort is the per-partition work unit, never a global
    * sort. Empty intervals (end <= start) are dropped like
    * [[overlapJoin]]'s.
    *
    * Output: (group, start, end, n_merged), ordered. */
  def mergeIntervals(df: DataFrame, groupCol: String,
      startCol: String, endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(startCol), col(endCol))
    val wPrev = w.rowsBetween(Long.MinValue, -1)
    val flagged = df.where(col(endCol) > col(startCol))
      .withColumn("__pmax", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__new")).over(
        w.rowsBetween(Long.MinValue, 0)))
    flagged.groupBy(col(groupCol), col("__run"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
      .select(col(groupCol), col("start"), col("end"), col("n_merged"))
      .orderBy(groupCol, "start")
  }

  /** For each left interval, the closest right interval in the same
    * group (the BEDTools `closest` op): distance 0 for any overlap,
    * otherwise the half-open gap `greatest(lStart - rEnd, rStart -
    * lEnd)`; ties broken by the smaller right key. Left rows whose
    * group holds no right interval are omitted. One output row per
    * left KEY: if a key carries several intervals, their candidate
    * sets pool and the key's single argmin is reported.
    *
    * Shape: candidates come from three bounded sources — the binned
    * [[overlapJoin]] (all distance-0 partners), a backward union-window
    * scan (nearest right END at or before each left start) and a
    * forward one (nearest right START at or after each left end) — then
    * one per-left-key argmin window. Each scan is one shuffle on the
    * group key; no range cross-join anywhere. */
  def closest(left: DataFrame, right: DataFrame, groupCol: String,
      lKey: String, lStart: String, lEnd: String,
      rKey: String, rStart: String, rEnd: String,
      binSize: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val l = left.select(col(groupCol).as("__g"), col(lKey).as("__lk"),
      col(lStart).cast("long").as("__ls"), col(lEnd).cast("long").as("__le"))
      .where(col("__le") > col("__ls") && col("__ls") >= 0)
    val r = right.select(col(groupCol).as("__rg"), col(rKey).as("__rk"),
      col(rStart).cast("long").as("__rs"), col(rEnd).cast("long").as("__re"))
      .where(col("__re") > col("__rs") && col("__rs") >= 0)

    // distance-0 candidates: every overlapping pair via the binned
    // join, group-local through the extra equi-key
    val ov = overlapJoin(
        l.withColumnRenamed("__g", "__og"), r.withColumnRenamed("__rg", "__og2"),
        "__ls", "__le", "__rs", "__re", binSize,
        extraKeys = Seq(("__og", "__og2")))
      .select(col("__lk"), col("__rk"), lit(0L).as("__dist"))

    // directional nearest via one tag-and-union window per direction
    // (the AsofJoin shape): rid DESC within equal coords makes `last`
    // pick the smallest right key among ties
    def directional(rCoord: String, probe: String, asc: Boolean): DataFrame = {
      val rPart = r.select(col("__rg").as("__g"), col(rCoord).as("__c"),
        lit(0).as("__tag"), col("__rk"),
        struct(col("__rk").as("k"), col("__rs").as("s"), col("__re").as("e")).as("__p"))
      val lPart = l.select(col("__g"), col(probe).as("__c"),
        lit(1).as("__tag"), col("__lk").as("__rk"),
        lit(null).cast(rPart.schema("__p").dataType).as("__p"))
        .select(col("__g"), col("__c"), col("__tag"), col("__rk"), col("__p"))
      val u = rPart.select("__g", "__c", "__tag", "__rk", "__p")
        .unionByName(lPart)
      val ord = if (asc) Seq(col("__c").asc, col("__tag").asc, col("__rk").desc)
      else Seq(col("__c").desc, col("__tag").asc, col("__rk").desc)
      val w = Window.partitionBy(col("__g")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
        .where(col("__tag") === 1 && col("__m").isNotNull)
        .select(col("__rk").as("__lk"), col("__m.k").as("__rk"),
          (if (asc) col("__c") - col("__m.e") else col("__m.s") - col("__c"))
            .as("__dist"))
        .where(col("__dist") >= 0)
    }
    val before = directional("__re", "__ls", asc = true)
    val after = directional("__rs", "__le", asc = false)

    val cands = ov.unionByName(before).unionByName(after)
    val wBest = Window.partitionBy(col("__lk"))
      .orderBy(col("__dist"), col("__rk"))
    cands.withColumn("__rn", row_number().over(wBest))
      .where(col("__rn") === 1)
      .select(col("__lk").as(lKey), col("__rk").as(rKey),
        col("__dist").as("distance"))
      .orderBy(lKey)
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
