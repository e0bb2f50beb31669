package graft

import graft.stats.NOISeq
import org.apache.spark.sql.DataFrame

/** NOISeq conformance (reference tests/test_differential.py:230-321).
  * M, D and Rank are deterministic and pinned to the R golden frame at
  * 1e-5; Prob depends on the technical-replicate simulation RNG (R's
  * rmultinom there, seeded JVM Poisson here), so it is checked for range
  * and ordering rather than bit equality. */
class NOISeqSpec extends SparkSpec {
  import spark.implicits._

  /** test_differential.py:233-242 single-replicate frame. */
  lazy val frame: DataFrame = Seq(
    ("genA", 23L, 23L, 20L),
    ("genB", 12L, 4L, 12L),
    ("genC", 9L, 21L, 12L),
    ("genD", 40L, 90L, 70L)
  ).toDF("gene_stable_id", "sampleA_1", "sampleB_1", "sampleC_1")

  val condToCols = Map(
    "A" -> Seq("sampleA_1"), "B" -> Seq("sampleB_1"), "C" -> Seq("sampleC_1"))

  test("column-naming contract (test_differential.py:262-267)") {
    val ns = NOISeq("A", "B", condToCols)
    assert(ns.name == "NOISeq")
    assert(ns.suffix.contains(" (NOISeq)"))
    assert(ns.columnsA == Seq("sampleA_1") && ns.columnsB == Seq("sampleB_1"))
    val named = NOISeq("A", "B", condToCols, Some("othername"))
    assert(named.suffix.contains(" (othername)"))
    intercept[IllegalArgumentException] { NOISeq("A", "B", condToCols, norm = "bogus") }
  }

  test("M, D, Rank match the R golden frame at 1e-5 (test_differential.py:281-321)") {
    val ns = NOISeq("A", "B", condToCols, Some("testcomparison"),
      includeOtherColumnsForVariance = true)
    val out = ns(frame)
    assert(out.columns.toSeq ==
      Seq("gene_stable_id", "logFC (testcomparison)", "D (testcomparison)",
        "Prob (testcomparison)", "Rank (testcomparison)"))
    val got = out.collect().map { r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(4))
    }.toMap
    val expected = Map(
      "genA" -> (0.9358447, 15.65268, 15.680631),
      "genB" -> (2.5208073, 14.12976, 14.352857),
      "genC" -> (-0.2865477, 2.81975, -2.834273),
      "genD" -> (-0.2340803, 10.04758, -10.050308))
    expected.foreach { case (g, (m, d, rk)) =>
      val (gm, gd, grk) = got(g)
      assert(math.abs(gm - m) < 1e-5, s"$g M: $gm vs $m")
      assert(math.abs(gd - d) < 1e-5, s"$g D: $gd vs $d")
      assert(math.abs(grk - rk) < 1e-5, s"$g Rank: $grk vs $rk")
    }
  }

  test("Prob: in [0,1], highest for the strongest signal, deterministic") {
    val ns = NOISeq("A", "B", condToCols, includeOtherColumnsForVariance = true)
    def probs = ns(frame).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val p1 = probs
    assert(p1.values.forall(p => p >= 0.0 && p <= 1.0))
    // genB has the largest |M| and near-largest D → must rank top
    assert(p1("genB") == p1.values.max)
    assert(p1 == probs) // deterministic across runs
  }

  /** 12-gene 3v3 matrix with two planted DE genes (g_up strongly up in A,
    * g_dn strongly down) over a flat background with mild replicate
    * noise — the noiseqbio branch must rank the planted signal at the
    * top of the Prob ordering. */
  lazy val bioFrame: DataFrame = {
    // integral counts (library sums stay exact in double arithmetic, so
    // run-to-run determinism is bit-level) with deterministic pseudo-noise
    val bg = (1 to 40).map { i =>
      val base = 20 + 7 * i
      def n(j: Int) = base + (i * 7 + j * 13) % 11 - 5
      (f"g_bg$i%02d", n(0).toDouble, n(1).toDouble, n(2).toDouble,
        n(3).toDouble, n(4).toDouble, n(5).toDouble)
    }
    val planted = Seq(
      ("g_up", 900.0, 870.0, 930.0, 45.0, 50.0, 40.0),
      ("g_dn", 30.0, 25.0, 35.0, 700.0, 720.0, 680.0))
    (bg ++ planted).toDF("gene_stable_id", "a_0", "a_1", "a_2", "r_0", "r_1", "r_2")
  }
  val bioCond = Map("A" -> Seq("a_0", "a_1", "a_2"), "R" -> Seq("r_0", "r_1", "r_2"))

  test("noiseqbio: planted DE genes get the top Prob, background stays low") {
    val ns = NOISeq("A", "R", bioCond, replicates = "biological",
      norm = "n", nclust = 4, index = "gene_stable_id")
    val out = ns(bioFrame).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    val probs = out.view.mapValues(_._2).toMap
    assert(probs.values.forall(p => p >= 0.0 && p <= 1.0))
    // planted genes carry the two highest probabilities, and decisively
    val bgMax = probs.filter(_._1.startsWith("g_bg")).values.max
    assert(probs("g_up") > bgMax && probs("g_dn") > bgMax,
      s"planted ${probs("g_up")}/${probs("g_dn")} vs background max $bgMax")
    assert(probs("g_up") > 0.5 && probs("g_dn") > 0.5)
    // sign contract: logFC positive for up-in-A, negative for down
    assert(out("g_up")._1 > 0 && out("g_dn")._1 < 0)
  }

  test("noiseqbio: deterministic across runs and partitioning") {
    val ns = NOISeq("A", "R", bioCond, replicates = "biological",
      norm = "n", nclust = 4, index = "gene_stable_id")
    def run(df: DataFrame) = ns(df).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(3))).sortBy(_._1).toSeq
    assert(run(bioFrame) == run(bioFrame.repartition(7)))
  }

  test("noiseqbio branch selection mirrors the reference guard") {
    // replicates="biological" with only 1 replicate in a condition falls
    // back to the classic noiseq path (differential.py:703-706 intent)
    val single = NOISeq("A", "B", condToCols, replicates = "biological",
      includeOtherColumnsForVariance = true)
    val out = single(frame)
    assert(out.columns.length == 5) // runs the classic path, same contract
  }

  test("balancedRelabelings: lexical, excludes observed labeling and mirror") {
    val perms = NOISeq.balancedRelabelings(
      Seq("a_0", "a_1", "a_2"), Seq("r_0", "r_1", "r_2"), 100)
    assert(perms.size == 18) // C(6,3) - identity - mirror
    assert(!perms.exists(_._1.toSet == Set("a_0", "a_1", "a_2")))
    assert(!perms.exists(_._1.toSet == Set("r_0", "r_1", "r_2")))
    assert(perms.forall { case (a, b) => a.size == 3 && b.size == 3 })
    // deterministic cap: a subset of the uncapped enumeration, stable size
    val capped = NOISeq.balancedRelabelings(
      Seq("a_0", "a_1", "a_2"), Seq("r_0", "r_1", "r_2"), 5)
    assert(capped.size == 5 && capped.toSet.subsetOf(perms.toSet))
  }

  test("rpkm norm: lc=1 divides by (length/1000), lc=0 ignores lengths") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("g1", 10.0, 40.0), ("g2", 20.0, 10.0)).toDF("gene_stable_id", "s1", "s2")
    val lens = Seq(("g1", 0L, 2000L), ("g2", 0L, 500L)).toDF("gene_stable_id", "start", "stop")
    val cond = Map("A" -> Seq("s1"), "B" -> Seq("s2"))
    val lc1 = NOISeq("A", "B", cond, norm = "rpkm", lc = 1, lengths = Some(lens))
    val lc0 = NOISeq("A", "B", cond, norm = "rpkm", lc = 0)
    def md(ns: NOISeq) = ns(df).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val with1 = md(lc1); val with0 = md(lc0)
    // M: the per-gene length factor cancels in the within-gene ratio
    assert(math.abs(with1("g1")._1 - with0("g1")._1) < 1e-12)
    assert(math.abs(with1("g2")._1 - with0("g2")._1) < 1e-12)
    // D: scales by 1/(len/1000) — g1 len 2000 → /2, g2 len 500 → x2
    assert(math.abs(with1("g1")._2 - with0("g1")._2 / 2.0) < 1e-9)
    assert(math.abs(with1("g2")._2 - with0("g2")._2 * 2.0) < 1e-9)
    // lc=0: lengths unused (NOISeq lc semantics), no annotation required
    assert(lc0(df).collect().length == 2)
    // fail-loud on missing annotation
    val missing = Seq(("g1", 0L, 2000L)).toDF("gene_stable_id", "start", "stop")
    intercept[IllegalArgumentException] {
      NOISeq("A", "B", cond, norm = "rpkm", lc = 1, lengths = Some(missing))(df).collect()
    }
    intercept[IllegalArgumentException] {
      NOISeq("A", "B", cond, norm = "rpkm", lc = 1)(df).collect()
    }
  }

  test("real-replicate noise path: two replicates per condition") {
    val df = Seq(
      ("g1", 10.0, 12.0, 30.0, 28.0),
      ("g2", 5.0, 6.0, 5.5, 6.5),
      ("g3", 100.0, 95.0, 40.0, 45.0)
    ).toDF("gene_stable_id", "a1", "a2", "b1", "b2")
    val ns = NOISeq("A", "B", Map("A" -> Seq("a1", "a2"), "B" -> Seq("b1", "b2")), norm = "n")
    val out = ns(df).collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(3))).toMap
    // g1 up in B → negative M; g3 down in B → positive M; g2 ~flat
    assert(out("g1")._1 < 0 && out("g3")._1 > 0)
    assert(out("g2")._2 <= out("g1")._2 && out("g2")._2 <= out("g3")._2) // weakest signal
  }
}
