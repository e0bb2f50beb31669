package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical window functions (reference SURVEY.md §2.6).
  *
  * W1 Benjamini-Hochberg FDR is the adjustment every differential operator's
  * `FDR`/`padj` column carries (reference: src/mdataframe/differential.py:113,
  * 149, 263 — produced inside R's `topTags`/`results`). Classic two-window
  * formulation: rank p ascending → raw = p·n/rank → reverse running min →
  * clip at 1.
  *
  * Scale note: the windows are global (no partition key) — Spark computes
  * them on a single partition. That is inherent to the statistic (it needs a
  * total order of p), and fine for per-gene result tables (≤ tens of
  * millions of rows). For larger tables use [[BhFdr.adjustDistributed]],
  * which gets the same numbers from a two-pass sort + cumulative partition
  * maxima instead of a single-partition window.
  */
object BhFdr {

  /** Append `outCol` = BH-adjusted p-values, exactly R's `p.adjust(method=
    * "BH")`: position-based ranks (`row_number`, NOT `rank` — R divides by
    * the index i of the sorted vector), so with tied p's the largest index
    * produces the smallest raw value; the reverse-min window uses the
    * default RANGE frame, which includes all peers of the current p, so
    * every tie receives that same adjusted value regardless of arbitrary
    * tie order. */
  def adjust(df: DataFrame, pCol: String, outCol: String = "fdr"): DataFrame = {
    val wRank = Window.orderBy(col(pCol).asc)
    val wRevMin = Window.orderBy(col(pCol).desc)
    df.withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__raw", col(pCol) * col("__n") / col("__rk"))
      .withColumn(outCol, least(min(col("__raw")).over(wRevMin), lit(1.0)))
      .drop("__n", "__rk", "__raw")
  }

  /** Same statistic without a single-partition window: global sort by p
    * (range-partitioned), per-partition running min of p·n/rank computed
    * map-side, then a reverse prefix-min of per-partition minima broadcast
    * back. Two passes over the sorted data, fully distributed. */
  def adjustDistributed(df: DataFrame, pCol: String, outCol: String = "fdr",
      smallCutoff: Long = 1000000L): DataFrame = {
    val n = df.count().toDouble
    // below the cutoff the single-partition window is faster than the
    // RDD zipWithIndex round-trips; the distributed formulation exists
    // for the scale where that window becomes the bottleneck
    if (n < smallCutoff) return adjust(df, pCol, outCol)
    // zipWithIndex on the sorted RDD keeps the range-partitioned sort order
    // and yields exact global ranks without a single-partition window.
    val schema = df.schema
    val ranked = {
      val rdd = df.orderBy(col(pCol).asc).rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      df.sparkSession.createDataFrame(rdd,
        schema.add("__rk", org.apache.spark.sql.types.LongType))
    }
    // BH with ties: reverse running min makes tied p's agree, and computing
    // raw with the LARGEST rank among ties is exactly what the min yields;
    // so row_number-style ranks are safe here.
    val withRaw = ranked.withColumn("__raw", col(pCol) * lit(n) / col("__rk"))
    // reverse prefix min via a second sort descending + per-partition scan
    val desc_ = withRaw.orderBy(col(pCol).desc, col("__rk").desc)
    val partMins = desc_.select(spark_partition_id().as("pid"), col("__raw"))
      .groupBy("pid").agg(min("__raw").as("m")).orderBy("pid").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val prefix: Map[Int, Double] = {
      var running = Double.MaxValue
      partMins.map { case (pid, m) =>
        val before = running; running = math.min(running, m); pid -> before
      }.toMap
    }
    val bc = df.sparkSession.sparkContext.broadcast(prefix)
    val outSchema = withRaw.schema.add(outCol, org.apache.spark.sql.types.DoubleType)
    val resRdd = desc_.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bc.value.getOrElse(pid, Double.MaxValue)
      it.map { r =>
        val raw = r.getAs[Double]("__raw")
        running = math.min(running, raw)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ math.min(running, 1.0))
      }
    }
    df.sparkSession.createDataFrame(resRdd, outSchema).drop("__rk", "__raw")
  }

  /** W2: ranking statistic per row (reference differential.py:599-600, 735). */
  def rankBy(df: DataFrame, scoreCol: String, ascending: Boolean = true,
      outCol: String = "Rank"): DataFrame = {
    val w = Window.orderBy(if (ascending) col(scoreCol).asc else col(scoreCol).desc)
    df.withColumn(outCol, rank().over(w))
  }

  /** [[rankBy]] without a single-partition window, for tables past the
    * small cutoff: global sort (range-partitioned) + zipWithIndex gives
    * row positions; `rank()`'s min-rank tie semantics are restored by
    * joining each row to min(position) over its score value. Same
    * numbers, two distributed passes. */
  def rankByDistributed(df: DataFrame, scoreCol: String, ascending: Boolean = true,
      outCol: String = "Rank", smallCutoff: Long = 1000000L): DataFrame = {
    if (df.count() < smallCutoff) return rankBy(df, scoreCol, ascending, outCol)
    val sorted = df.orderBy(if (ascending) col(scoreCol).asc else col(scoreCol).desc)
    val schema = df.schema
    val ranked = {
      val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      df.sparkSession.createDataFrame(rdd,
        schema.add("__pos", org.apache.spark.sql.types.LongType))
    }
    val minRanks = ranked.groupBy(col(scoreCol).as("__s"))
      .agg(min(col("__pos")).as("__minpos"))
    // null-safe equality: rank() keeps null-score rows (they sort first),
    // so the distributed path must too — a plain === join would silently
    // drop them
    ranked.join(minRanks, ranked(scoreCol) <=> minRanks("__s"))
      .withColumn(outCol, col("__minpos").cast("int"))
      .drop("__s", "__minpos", "__pos")
  }
}
