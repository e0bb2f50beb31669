package graft

import org.apache.spark.sql.functions._
import graft.stats.{DESeq2LRT, DESeq2Unpaired}

/** Behavioral tests for the LRT variant of D4 (the reference's
  * DESeq2Timeseries is declared-but-broken — differential.py:492-509 dead
  * code — so there are no golden values; SURVEY.md §2.5 D4). We assert the
  * statistical contract: nested-model deviance, χ² calibration, agreement
  * with the Wald test on the two-condition fixture, and null behavior when
  * the tested factor carries no signal. */
class DESeq2LRTSpec extends SparkSpec {

  val genes = Seq("genA", "genB", "genC", "genD")
  val counts: Map[String, Array[Double]] = Map(
    "genA" -> Array(23.0, 2, 21, 23, 3, 4),
    "genB" -> Array(12.0, 14, 14, 4, 4, 5),
    "genC" -> Array(9.0, 6, 6, 21, 22, 23),
    "genD" -> Array(40.0, 80, 80, 90, 90, 80))
  val samples = Seq("sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")
  val condition = Seq("A", "A", "A", "B", "B", "B")

  def fixtureDf = {
    val rows = genes.map(g => (g, counts(g)(0), counts(g)(1), counts(g)(2),
      counts(g)(3), counts(g)(4), counts(g)(5)))
    spark.createDataFrame(rows).toDF(("gene_stable_id" +: samples): _*)
  }

  def lrt = DESeq2LRT(samples, Map("condition" -> condition),
    full = Seq("condition"), reduced = Seq(), index = "gene_stable_id")

  test("contract: names, suffix, nesting validation") {
    assert(lrt.name == "DESeq2LRT")
    assert(lrt.suffix.contains(" (DESeq2LRT)"))
    assert(lrt.columns.forall(_.endsWith(" (DESeq2LRT)")))
    assert(DESeq2LRT(samples, Map("condition" -> condition),
      Seq("condition"), Seq(), Some("t0_vs_t1")).suffix.contains(" (t0_vs_t1)"))
    intercept[IllegalArgumentException] {
      DESeq2LRT(samples, Map("condition" -> condition),
        full = Seq(), reduced = Seq("condition"))
    }
  }

  test("LRT against intercept-only agrees with the Wald test in ordering") {
    val out = lrt(fixtureDf).collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // (log2FC, p, FDR, baseMean, lfcSE, stat)
    assert(out.keySet == genes.toSet)
    out.foreach { case (g, (lfc, p, fdr, bm, se, stat)) =>
      assert(stat >= 0, s"$g deviance non-negative")
      assert(p > 0 && p <= 1, s"$g p in range")
      assert(fdr >= p - 1e-12, s"$g fdr >= p")
      assert(bm > 0 && se > 0)
    }
    // design is B-vs-A treatment coding (B dummy): sign flips vs A-vs-B
    assert(out("genB")._1 < 0) // B lower than A
    assert(out("genC")._1 > 0) // B higher than A
    // significance ordering mirrors the Wald golden: genC < genB < {genA, genD}
    val p = genes.map(g => out(g)._2)
    assert(p(2) < p(1) && p(1) < p(0) && p(1) < p(3))
    // Wald agreement: same fixture through DESeq2Unpaired
    val wald = DESeq2Unpaired("A", "B",
      Map("A" -> samples.take(3), "B" -> samples.drop(3)),
      index = "gene_stable_id")(fixtureDf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val lrtOrder = genes.sortBy(g => out(g)._2)
    val waldOrder = genes.sortBy(wald)
    assert(lrtOrder == waldOrder, s"LRT $lrtOrder vs Wald $waldOrder")
  }

  test("null factor: no-signal dummy yields non-significant p") {
    // split that cuts across condition: no real signal for the extra factor
    val batch = Seq("x", "y", "x", "y", "x", "y")
    val l = DESeq2LRT(samples,
      Map("condition" -> condition, "batch" -> batch),
      full = Seq("condition", "batch"), reduced = Seq("condition"),
      index = "gene_stable_id")
    val out = l(fixtureDf).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a pure-noise factor should not reach strong significance on 4 genes
    assert(out.values.count(_ < 0.01) == 0, s"null-factor ps: $out")
  }

  test("deviance is chi-square-ish under the null (simulated Poisson)") {
    // 200 genes, no condition effect, Poisson-like counts: LRT p should be
    // roughly uniform — check via a loose KS-style bound on quartiles
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val lambda = 20.0 + rng.nextInt(60)
      def pois(l: Double): Double = {
        var k = 0; var p = math.exp(-l); var f = p; val u = rng.nextDouble()
        while (f < u && k < 10000) { k += 1; p *= l / k; f += p }
        k.toDouble
      }
      (s"g$i", pois(lambda), pois(lambda), pois(lambda), pois(lambda), pois(lambda), pois(lambda))
    }
    val df = spark.createDataFrame(rows).toDF(("gene_stable_id" +: samples): _*)
    val out = lrt(df).collect().map(_.getDouble(2))
    val frac05 = out.count(_ < 0.05).toDouble / out.length
    assert(frac05 < 0.15, s"null rejection rate $frac05 too high")
    val median = out.sorted.apply(out.length / 2)
    assert(median > 0.2, s"null p median $median too small")
  }
}
