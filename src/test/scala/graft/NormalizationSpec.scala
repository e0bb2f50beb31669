package graft

import graft.functions.{Normalization, Tmm}
import org.apache.spark.sql.DataFrame

/** Golden-value conformance for TMM / removeBatchEffect against the
  * R-computed frames hard-coded in the reference suite
  * (tests/test_transformations.py:71-105), tolerance 1e-5. */
class NormalizationSpec extends SparkSpec {
  import spark.implicits._

  /** conftest.py:44-57 test_frame. */
  lazy val counts: DataFrame = Seq(
    ("genA", 23L, 2L, 21L, 23L, 3L, 4L),
    ("genB", 12L, 14L, 14L, 4L, 4L, 5L),
    ("genC", 9L, 6L, 6L, 21L, 22L, 23L),
    ("genD", 40L, 80L, 80L, 90L, 90L, 80L)
  ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")

  val samples = Seq("sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")
  val groups = samples.map(s => s -> (if (s.startsWith("sampleA")) "A" else "B")).toMap

  private def values(df: DataFrame, cols: Seq[String]): Map[String, Seq[Double]] =
    df.collect().map { r =>
      r.getString(r.fieldIndex("gene_stable_id")) -> cols.map(c => r.getAs[Double](c))
    }.toMap

  test("library sizes and TMM factors match edgeR") {
    val lib = Normalization.libSizes(counts, samples)
    assert(lib("sampleA_1") == 84.0 && lib("sampleB_1") == 138.0)
    val f = Normalization.tmmFactors(counts, samples)
    // edgeR calcNormFactors on test_frame (validated against golden logCPM)
    val expect = Map(
      "sampleA_1" -> 1.30509701, "sampleA_2" -> 1.03553864, "sampleA_3" -> 0.87293340,
      "sampleB_1" -> 0.89311698, "sampleB_2" -> 1.00044878, "sampleB_3" -> 0.94865125)
    expect.foreach { case (c, e) => assert(math.abs(f(c) - e) < 1e-6, s"$c: ${f(c)} vs $e") }
  }

  test("TMM log2 CPM matches golden frame (test_transformations.py:71-87)") {
    val tmm = Tmm(Some(groups), suffixDefault = true)
    assert(tmm.suffix.contains(" (TMM)"))
    val out = tmm(counts)
    val suffixed = samples.map(_ + " (TMM)")
    assert(out.columns.toSeq == ("gene_stable_id" +: suffixed))
    val got = values(out, suffixed)
    val expected = Map(
      "genA" -> Seq(17.83412, 15.83628, 17.77050, 17.69636, 15.97150, 16.20760),
      "genB" -> Seq(17.11131, 17.31247, 17.31247, 16.11376, 16.13496, 16.36352),
      "genC" -> Seq(16.82961, 16.50897, 16.50897, 17.59148, 17.68496, 17.87144),
      "genD" -> Seq(18.52032, 19.48979, 19.48979, 19.44007, 19.48721, 19.48176))
    expected.foreach { case (g, exp) =>
      got(g).zip(exp).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"$g: ${got(g)} vs $exp")
      }
    }
  }

  test("TMM + batch correction matches golden frame (test_transformations.py:89-105)") {
    val batches = samples.zipWithIndex.map { case (s, i) => s -> (if (i < 2) "x" else "y") }.toMap
    val tmm = Tmm(Some(groups), Some(batches), suffixDefault = true)
    assert(tmm.suffix.contains(" (TMM batch-corrected)"))
    val got = values(tmm(counts), samples.map(_ + " (TMM batch-corrected)"))
    val expected = Map(
      "genA" -> Seq(17.87226, 15.87443, 17.73236, 17.65821, 15.93335, 16.16945),
      "genB" -> Seq(16.74595, 16.94712, 17.67783, 16.47911, 16.50032, 16.72888),
      "genC" -> Seq(17.20207, 16.88143, 16.13651, 17.21902, 17.31250, 17.49898),
      "genD" -> Seq(18.75514, 19.72461, 19.25496, 19.20524, 19.25238, 19.24694))
    expected.foreach { case (g, exp) =>
      got(g).zip(exp).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"$g: ${got(g)} vs $exp")
      }
    }
  }

  test("approximate (scale-path) TMM stays close to exact on small data") {
    val exact = Normalization.tmmFactors(counts, samples)
    val approx = Normalization.tmmFactors(counts, samples, approximate = true)
    samples.foreach(c => assert(math.abs(exact(c) - approx(c)) < 0.2,
      s"$c: ${exact(c)} vs ${approx(c)}"))
  }

  test("plain CPM: count/libsize*1e6") {
    val lib = Normalization.libSizes(counts, samples)
    val out = Normalization.cpm(counts, samples, lib)
    val genA = out.filter($"gene_stable_id" === "genA").collect()(0)
    assert(math.abs(genA.getAs[Double]("sampleA_1") - 23.0 / 84.0 * 1e6) < 1e-9)
  }
}
