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
