package graft

import graft.functions.Normalization
import graft.stats.{DESeq2Unpaired, Tmm2}
import org.apache.spark.sql.functions._

/** The scale paths (approximate percentiles, quantile-cut TMM trims)
  * must produce the SAME numbers as the exact small-frame paths to
  * within the documented rank-accuracy tolerances — otherwise crossing
  * a cutoff would silently change results. Each test forces both paths
  * on one mid-size frame and compares. */
class ScalePathSpec extends SparkSpec {

  // 4000 genes × 4 samples of seeded NB-ish counts with unequal depths
  private lazy val counts = {
    val rnd = new scala.util.Random(99)
    val depth = Array(1.0, 1.6, 0.7, 1.25)
    val rows = (0 until 4000).map { g =>
      val base = math.exp(rnd.nextGaussian() * 1.5 + 3.0)
      def draw(j: Int): Double =
        math.max(0.0, math.round(base * depth(j) * math.exp(rnd.nextGaussian() * 0.4)).toDouble)
      (s"g$g", draw(0), draw(1), draw(2), draw(3))
    }
    spark.createDataFrame(rows).toDF("gene_stable_id", "s1", "s2", "s3", "s4")
  }
  private val samples = Seq("s1", "s2", "s3", "s4")

  test("TMM factors: quantile-cut trim matches exact ranks (1e-2)") {
    val exact = Normalization.tmmFactors(counts, samples)
    val approx = Normalization.tmmFactors(counts, samples, approximate = true)
    samples.foreach { c =>
      assert(math.abs(exact(c) - approx(c)) < 1e-2,
        s"$c exact=${exact(c)} approx=${approx(c)}")
    }
  }

  test("size factors: approximate median matches exact (1e-3 relative)") {
    val exact = DESeq2Unpaired.sizeFactors(counts, samples)
    val approx = DESeq2Unpaired.sizeFactors(counts, samples, exactCutoff = 0L)
    exact.zip(approx).zipWithIndex.foreach { case ((e, a), i) =>
      assert(math.abs(e - a) / e < 1e-3, s"sample $i exact=$e approx=$a")
    }
  }

  test("reference-column selection: approximate quartiles pick the same column") {
    val lib = Normalization.libSizes(counts, samples)
    val exact = Normalization.refColumn(counts, samples, lib)
    val approx = Normalization.refColumn(counts, samples, lib, exact = false)
    assert(exact == approx)
  }

  test("NOISeq pair TMM: quantile-cut trim matches exact ranks (1e-2)") {
    // pairFactor's contract is NOISeq's zero-replaced counts (k = 0.5):
    // raw zeros would divide by zero in the weight term under ANSI mode
    val zeroed = counts.select(col("gene_stable_id") +:
      samples.map(c => when(col(c) === 0.0, lit(0.5)).otherwise(col(c)).as(c)): _*)
    val lib = Normalization.libSizes(zeroed, samples)
    val exact = Tmm2.pairFactor(zeroed, "s2", "s1", lib("s2"), lib("s1"))
    val approx = Tmm2.pairFactor(zeroed, "s2", "s1", lib("s2"), lib("s1"),
      exactCutoff = 0L)
    assert(math.abs(exact - approx) < 1e-2, s"exact=$exact approx=$approx")
  }
}
