package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path (SURVEY.md §4
  * partitioning/shuffle row; harness north star "salting for skew, AQE
  * for runtime re-plan").
  *
  * When they matter: Spark's hash aggregation already does map-side
  * partial aggregation, so a skewed `groupBy` key alone rarely
  * overwhelms one reducer. The residual hot spots are
  *
  *  - JOINS on skewed keys where the build side is too big to broadcast
  *    (AQE's skew-join split handles sort-merge joins after the fact;
  *    salting prevents the skew shuffle up front and also covers
  *    AQE-ineligible shapes), and
  *  - DISTINCT-style aggregations, where every distinct value of a hot
  *    key travels to one reducer before collapsing.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt derived
    * from its non-key columns; the small side replicates `saltFactor`
    * times so every (key, salt) bucket finds its match. Join type may be
    * "inner" or "left_outer" (the replicate side must be the lookup
    * side). Result columns = big columns + small's non-key columns. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    val nonKey = big.columns.filterNot(keys.contains)
    val saltSrc = if (nonKey.nonEmpty) nonKey.map(col).toSeq else Seq(rand(42))
    val b = big.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(saltFactor.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase distinct count per key: phase 1 collapses (key, value)
    * duplicates across `saltFactor`-spread partitions, phase 2 counts —
    * the hot key's distinct set never lands on a single reducer
    * un-collapsed. */
  def distinctCountSalted(df: DataFrame, key: String, value: String,
      outCol: String = "n_distinct"): DataFrame = {
    df.select(col(key), col(value))
      .distinct() // phase 1: hash-shuffle on (key, value) — spread by value
      .groupBy(col(key)).agg(count(lit(1)).as(outCol)) // phase 2: tiny rows
  }

  /** Key-frequency report to decide salting: top-n keys with counts and
    * their share of the table (driver-sized output). */
  def skewReport(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / total)
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
