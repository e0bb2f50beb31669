package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extracts the fitted IVFADC constants (coarse centroids + residual
  * codebooks) that the q_similarity_ivfpq oracle embeds at the sf0.01
  * gate, and the discrete-choice margins (cell assignment, probe
  * boundary, residual encode argmin, ADC rank). Not a test — re-run
  * after any fixture regeneration. */
object IvfPqOracleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (cents, cb) = graft.operators.IvfPq.fit(e, "embedding",
      nlist = 16, m = 16, ksub = 16, seed = 42L)
    println(s"IVFPQ nlist=${cents.length} m=${cb.m} ksub=${cb.ksub} dsub=${cb.dsub}")
    for ((c, i) <- cents.zipWithIndex) {
      val v = c.map(x => f"$x%.17g").mkString(", ")
      println(s"IVFPQCENT |  ($i, [$v]::DOUBLE[]),")
    }
    for (s <- 0 until cb.m; c <- 0 until cb.ksub) {
      val v = cb.books(s)(c).map(x => f"$x%.17g").mkString(", ")
      println(s"IVFPQCB |  ($s, $c, [$v]::DOUBLE[]),")
    }

    // ---- margins ----
    val u = graft.operators.Similarity.withUnitVec(e, "embedding", "__uv")
    val sample = u.select(col("vec_id"), col("__uv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(v: Array[Double], c: Array[Double], off: Int = 0): Double = {
      var d = 0.0; var i = 0
      val n = math.min(c.length, v.length - off)
      while (i < n) { val t = v(off + i) - c(i); d += t * t; i += 1 }
      d
    }
    // cell assign margin + probe boundary (nprobe=6)
    var assignMargin = Double.MaxValue
    var probeMargin = Double.MaxValue
    for ((id, v) <- sample) {
      val ds = cents.map(c => d2(v, c)).sorted
      assignMargin = math.min(assignMargin, ds(1) - ds(0))
      if (id < 8) probeMargin = math.min(probeMargin, ds(6) - ds(5))
    }
    println(f"IVFPQ assign margin: $assignMargin%.6g  probe margin: $probeMargin%.6g")
    // residual encode margin
    var encMargin = Double.MaxValue
    for ((_, v) <- sample) {
      val cell = cents.indices.minBy(c => d2(v, cents(c)))
      val res = Array.tabulate(v.length)(i => v(i) - cents(cell)(i))
      for (s <- 0 until cb.m) {
        val ds = cb.books(s).map(c => d2(res, c, s * cb.dsub)).sorted
        encMargin = math.min(encMargin, ds(1) - ds(0))
      }
    }
    println(f"IVFPQ residual encode margin: $encMargin%.6g")

    // ADC rank margin + recall at the gate params
    val idx = graft.operators.IvfPq.IvfPqIndex.build(e, "embedding", "vec_id",
      nlist = 16, m = 16, ksub = 16, seed = 42L)
    val q = e.filter(col("vec_id") < 8)
    val top = idx.topK(q, "embedding", "vec_id", 12, nprobe = 6)
      .orderBy("query_id", "rank").collect()
    val gaps = top.groupBy(_.getLong(0)).values.flatMap { rows =>
      val d = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      d.sliding(2).filter(_.length == 2).map(p => p(1) - p(0))
    }
    println(f"IVFPQ ADC rank margin: ${gaps.min}%.6g  zero-gaps: ${gaps.count(_ == 0.0)}")

    val brute = graft.operators.Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").join(brute, Seq("query_id", "neighbor_id"))
        .count().toDouble / brute.count()
    println(f"IVFPQ ADC recall@10 (nprobe 6): ${recall(idx.topK(q, "embedding", "vec_id", 10, 6))}%.4f")
    println(f"IVFPQ refine(64) recall@10:     ${recall(idx.refineTopK(e, q, "embedding", "vec_id", 10, 6, 64))}%.4f")
    println(f"IVFPQ ADC recall@10 (nprobe 16): ${recall(idx.topK(q, "embedding", "vec_id", 10, 16))}%.4f")

    spark.stop()
  }
}
