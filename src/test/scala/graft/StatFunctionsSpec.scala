package graft

import graft.functions.BhFdr
import org.apache.spark.sql.functions._

class StatFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  private def adjusted(ps: Seq[Double], distributed: Boolean = false): Seq[Double] = {
    val df = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "p")
    // smallCutoff=1 forces the genuinely distributed branch — with the
    // default cutoff a small fixture would silently fall back to the
    // windowed path and leave the scale path untested
    val out = if (distributed) BhFdr.adjustDistributed(df, "p", smallCutoff = 1)
      else BhFdr.adjust(df, "p")
    out.orderBy("id").collect().map(_.getAs[Double]("fdr")).toSeq
  }

  test("BH matches R p.adjust(method='BH') on a known vector") {
    // R: p.adjust(c(0.005, 0.009, 0.05, 0.1, 0.2), method="BH")
    //    = 0.0225 0.0225 0.0833333... 0.125 0.2
    val got = adjusted(Seq(0.005, 0.009, 0.05, 0.1, 0.2))
    val want = Seq(0.0225, 0.0225, 0.25 / 3, 0.125, 0.2)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < eps, s"$got vs $want") }
  }

  test("BH ties: tied p-values share the adjusted value of the largest index (R semantics)") {
    // R: p.adjust(c(0.01, 0.01, 0.5), method="BH") = 0.015 0.015 0.5
    val got = adjusted(Seq(0.01, 0.01, 0.5))
    assert(math.abs(got(0) - 0.015) < eps && math.abs(got(1) - 0.015) < eps && got(2) == 0.5)
  }

  test("BH clips at 1 and is monotone in p") {
    val got = adjusted(Seq(0.9, 0.95, 1.0, 0.8))
    assert(got.forall(_ <= 1.0))
    val sortedByP = Seq(0.8, 0.9, 0.95, 1.0).map(p => got(Seq(0.9, 0.95, 1.0, 0.8).indexOf(p)))
    assert(sortedByP == sortedByP.sorted)
  }

  test("distributed BH equals windowed BH") {
    val ps = (1 to 500).map(i => ((i * 7919) % 997) / 997.0)
    assert(adjusted(ps) == adjusted(ps, distributed = true))
  }

  test("rankBy appends a Rank column (W2)") {
    val df = Seq((1, 0.3), (2, 0.1), (3, 0.2)).toDF("id", "s")
    val got = BhFdr.rankBy(df, "s").orderBy("id").collect().map(_.getAs[Int]("Rank")).toSeq
    assert(got == Seq(3, 1, 2))
  }

  test("distributed rankBy equals windowed rankBy, including ties and nulls") {
    val scores = (1 to 400).map { i =>
      if (i % 37 == 0) null else java.lang.Double.valueOf(((i * 31) % 13).toDouble)
    } // heavy ties + null scores (rank() keeps them; the join must too)
    val df = scores.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s")
    def ranksOf(out: org.apache.spark.sql.DataFrame): Seq[Int] =
      out.orderBy("id").collect().map(_.getAs[Int]("Rank")).toSeq
    val windowed = ranksOf(BhFdr.rankBy(df, "s"))
    val dist = ranksOf(BhFdr.rankByDistributed(df, "s", smallCutoff = 1))
    assert(dist == windowed)
    val windowedDesc = ranksOf(BhFdr.rankBy(df, "s", ascending = false))
    val distDesc = ranksOf(BhFdr.rankByDistributed(df, "s", ascending = false, smallCutoff = 1))
    assert(distDesc == windowedDesc)
  }
}
