package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extracts the fitted PQ codebooks that the q_similarity_pq /
  * q_similarity_pq_refine oracle SQL embeds as literals at the sf0.01
  * gate (the q_similarity_ivf embedded-centroids pattern; not a test),
  * and measures the discrete-choice margins that justify trusting
  * cross-engine floating point: encode argmin margin, ADC rank margin,
  * refine rank margin. Re-run after any fixture regeneration and
  * refresh the literals in SparkEntry. */
object PqOracleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = graft.operators.Pq.fit(e, "embedding", m = 16, ksub = 16, seed = 42L)
    println(s"PQ m=${cb.m} ksub=${cb.ksub} dsub=${cb.dsub}")
    // DuckDB VALUES rows: (s, cell, [..]::DOUBLE[])
    for (s <- 0 until cb.m; c <- 0 until cb.ksub) {
      val v = cb.books(s)(c).map(x => f"$x%.17g").mkString(", ")
      println(s"PQCB |  ($s, $c, [$v]::DOUBLE[]),")
    }

    // ---- margins ----
    val u = graft.operators.Similarity.withUnitVec(e, "embedding", "__uv")
    import spark.implicits._
    val sample = u.select(col("vec_id"), col("__uv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    // encode margin: min over (row, subspace) of d2nd − d1st
    var encMargin = Double.MaxValue
    val dsub = cb.dsub
    for ((_, v) <- sample; s <- 0 until cb.m) {
      val ds = cb.books(s).map { ctr =>
        var d = 0.0; var i = 0
        while (i < dsub) { val t = v(s * dsub + i) - ctr(i); d += t * t; i += 1 }
        d
      }.sorted
      encMargin = math.min(encMargin, ds(1) - ds(0))
    }
    println(f"PQ encode margin (min d2nd-d1st): $encMargin%.6g")

    // ADC rank margin at the gate: queries vec_id < 8, k = 10 — min gap
    // between adjacent adist in each query's top-12 (rank boundary ±1)
    val idx = graft.operators.Pq.PqIndex.build(e, "embedding", "vec_id",
      m = 16, ksub = 16, seed = 42L)
    val top = idx.topK(e.filter(col("vec_id") < 8), "embedding", "vec_id", 12)
      .orderBy("query_id", "rank").collect()
    val gaps = top.groupBy(_.getLong(0)).values.flatMap { rows =>
      val d = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      d.sliding(2).filter(_.length == 2).map(p => p(1) - p(0))
    }
    println(f"PQ ADC rank margin (min adjacent top-12 gap): ${gaps.min}%.6g")
    println(s"PQ ADC zero-gap count (exact ties, ok — id tiebreak): ${gaps.count(_ == 0.0)}")

    // refine: exact-cosine rank margin inside the shortlist (refine=32)
    val ref = idx.refineTopK(e, e.filter(col("vec_id") < 8), "embedding",
      "vec_id", 12, refine = 32).orderBy("query_id", "rank").collect()
    val rgaps = ref.groupBy(_.getLong(0)).values.flatMap { rows =>
      val sc = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      sc.sliding(2).filter(_.length == 2).map(p => p(0) - p(1))
    }
    println(f"PQ refine rank margin (min adjacent top-12 score gap): ${rgaps.min}%.6g")

    // recall@10 vs brute force at the gate params
    val brute = graft.operators.Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 8), "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").join(brute, Seq("query_id", "neighbor_id"))
        .count().toDouble / brute.count()
    println(f"PQ ADC recall@10: ${recall(idx.topK(e.filter(col("vec_id") < 8), "embedding", "vec_id", 10))}%.4f")
    println(f"PQ refine(32) recall@10: ${recall(idx.refineTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id", 10, 32))}%.4f")
    println(f"PQ refine(64) recall@10: ${recall(idx.refineTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id", 10, 64))}%.4f")

    spark.stop()
  }
}
