package graft

import graft.operators.{IvfPq, Pq, Similarity}
import org.apache.spark.sql.functions._

/** IVFADC: shared-sample fit determinism, residual-vs-raw quantization
  * fidelity, the probe/recall trade, and the index-family laws. The
  * q_similarity_ivfpq gates pin everything downstream of the fits
  * against DuckDB. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private def queries = embeddings.filter(col("vec_id") < 6)

  test("fit is layout-invariant and shares the coarse quantizer with IvfIndex") {
    val (c1, b1) = IvfPq.fit(embeddings, "embedding", nlist = 8, m = 8, ksub = 8, seed = 7L)
    val (c2, b2) = IvfPq.fit(embeddings.repartition(13).orderBy(col("vec_id").desc),
      "embedding", nlist = 8, m = 8, ksub = 8, seed = 7L)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(b1.books.map(_.map(_.toSeq).toSeq).toSeq ==
      b2.books.map(_.map(_.toSeq).toSeq).toSeq)
    // the coarse fit IS the IvfIndex quantizer fit (same sample recipe,
    // same lloyd) — one recipe, one oracle-constant story
    val u = Similarity.withUnitVec(embeddings, "embedding", "__uv")
    val ivf = Similarity.fitQuantizer(u, "__uv", 8, 7L, 10)
    assert(c1.map(_.toSeq).toSeq == ivf.map(_.toSeq).toSeq)
  }

  test("residual codebooks beat raw-vector codebooks at equal bit budget (the point of IVFADC)") {
    val q = queries
    val brute = Similarity.bruteForceTopK(embeddings, q, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").join(brute, Seq("query_id", "neighbor_id"))
        .count().toDouble / brute.count()
    // same m×ksub code budget; ivfpq probes EVERY cell so the scan sets
    // match and only quantization fidelity differs
    val raw = recall(Pq.topK(embeddings, q, "embedding", "vec_id", 10, m = 16, ksub = 16))
    val res = recall(IvfPq.topK(embeddings, q, "embedding", "vec_id", 10,
      nlist = 16, nprobe = 16, m = 16, ksub = 16))
    assert(res >= raw,
      s"residual quantization must not lose recall at full probe: ivfpq=$res pq=$raw")
  }

  test("nprobe is the scan/recall dial: wider probes never lose recall") {
    val q = queries
    val idx = IvfPq.IvfPqIndex.build(embeddings, "embedding", "vec_id",
      nlist = 16, m = 16, ksub = 16)
    val brute = Similarity.bruteForceTopK(embeddings, q, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
    def hits(nprobe: Int): Long =
      idx.topK(q, "embedding", "vec_id", 10, nprobe)
        .select("query_id", "neighbor_id").join(brute, Seq("query_id", "neighbor_id"))
        .count()
    val h2 = hits(2); val h6 = hits(6); val h16 = hits(16)
    assert(h2 <= h6 && h6 <= h16, s"recall must be monotone in nprobe: $h2, $h6, $h16")
  }

  test("save → load round-trips; codes persist partitioned by cell for probe pruning") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val idx = IvfPq.IvfPqIndex.build(embeddings, "embedding", "vec_id",
      nlist = 8, m = 8, ksub = 8)
    idx.save(dir)
    val loaded = IvfPq.IvfPqIndex.load(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    assert(loaded.cb.books.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.cb.books.map(_.map(_.toSeq).toSeq).toSeq)
    val a = idx.topK(queries, "embedding", "vec_id", 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val b = loaded.topK(queries, "embedding", "vec_id", 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(a == b)
    // cell partitioning on disk (the probe-pruning layout)
    assert(new java.io.File(s"$dir/codes").listFiles()
      .exists(_.getName.startsWith("__cell=")))
    // a probe's scan prunes to its cell partitions
    val p = loaded.topK(queries, "embedding", "vec_id", 10, nprobe = 4)
      .queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters") || p.contains("__cell"), p.take(1500))
  }

  test("load is loud on mutated meta") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqbad").toString
    val idx = IvfPq.IvfPqIndex.build(embeddings, "embedding", "vec_id",
      nlist = 8, m = 8, ksub = 8)
    idx.save(dir)
    val rows = spark.read.parquet(s"$dir/centroids")
      .select("centroid").collect().map(_.getSeq[Double](0))
    rows.toSeq.toDF("centroid").write.mode("overwrite").parquet(s"$dir/centroids")
    val e = intercept[IllegalArgumentException] { IvfPq.IvfPqIndex.load(spark, dir) }
    assert(e.getMessage.contains("missing field"))
  }

  test("append with frozen quantizers; remove(append(build(A), B), ids(B)) == build(A)") {
    val a = embeddings.filter(col("vec_id") % 3 =!= 0)
    val b = embeddings.filter(col("vec_id") % 3 === 0)
    val built = IvfPq.IvfPqIndex.build(a, "embedding", "vec_id", nlist = 8, m = 8, ksub = 8)
    val appended = built.append(b, "embedding", "vec_id")
    val ids = appended.codes.select("neighbor_id").as[Long].collect().toSet
    assert(b.select("vec_id").as[Long].collect().forall(ids.contains))
    val restored = appended.remove(b.select(col("vec_id")))
    assert(restored.codes.exceptAll(built.codes).isEmpty &&
      built.codes.exceptAll(restored.codes).isEmpty)
    val got = restored.topK(queries, "embedding", "vec_id", 10, nprobe = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got.intersect(b.select("vec_id").as[Long].collect().toSet).isEmpty)
  }
}
