package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Product quantization: fit determinism, ADC vs refine recall, the
  * index-family laws (save→load round-trip, frozen-codebook append,
  * remove inverse, loud load validation). The q_similarity_pq /
  * q_similarity_pq_refine gates pin the downstream-of-fit math against
  * DuckDB; these rows pin what the oracle cannot see (the fit itself
  * and the persistence layer). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private def queries = embeddings.filter(col("vec_id") < 6)

  test("fit is layout-invariant: repartitioned/reordered corpus gives identical codebooks") {
    val a = Pq.fit(embeddings, "embedding", m = 8, ksub = 8, seed = 7L)
    val b = Pq.fit(embeddings.repartition(13).orderBy(col("vec_id").desc),
      "embedding", m = 8, ksub = 8, seed = 7L)
    assert(a.books.map(_.map(_.toSeq).toSeq).toSeq ==
      b.books.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("fit rejects non-divisible dims and empty input") {
    intercept[IllegalArgumentException] {
      Pq.fit(embeddings, "embedding", m = 7, ksub = 8)
    }
    intercept[IllegalArgumentException] {
      Pq.fit(embeddings.filter(col("vec_id") < 0), "embedding", m = 8)
    }
  }

  test("codes compress: m ints per row, every code < ksub") {
    val idx = Pq.PqIndex.build(embeddings, "embedding", "vec_id", m = 16, ksub = 16)
    val rows = idx.codes.collect()
    assert(rows.length == embeddings.count())
    assert(rows.forall { r =>
      val cs = r.getSeq[Int](1)
      cs.length == 16 && cs.forall(c => c >= 0 && c < 16)
    })
  }

  test("refine repairs ADC recall (gate constants: 0.4125 ADC, 0.9125 refine at sf0.01 shape)") {
    val q = queries
    val brute = Similarity.bruteForceTopK(embeddings, q, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").join(brute, Seq("query_id", "neighbor_id"))
        .count().toDouble / brute.count()
    val adc = recall(Pq.topK(embeddings, q, "embedding", "vec_id", 10, m = 16, ksub = 16))
    val ref = recall(Pq.topK(embeddings, q, "embedding", "vec_id", 10, m = 16, ksub = 16,
      refine = 64))
    assert(ref >= adc, s"refine ($ref) must not lose recall vs ADC ($adc)")
    assert(ref >= 0.8, s"refine(64) recall@10 $ref below the measured band")
  }

  test("refine rejects refine < k") {
    val idx = Pq.PqIndex.build(embeddings, "embedding", "vec_id", m = 8, ksub = 8)
    intercept[IllegalArgumentException] {
      idx.refineTopK(embeddings, queries, "embedding", "vec_id", k = 10, refine = 5)
    }
  }

  test("save → load round-trips: geometry preserved, topK bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val idx = Pq.PqIndex.build(embeddings, "embedding", "vec_id", m = 16, ksub = 16)
    idx.save(dir)
    val loaded = Pq.PqIndex.load(spark, dir)
    assert(loaded.cb.m == 16 && loaded.cb.ksub == 16 && loaded.cb.dsub == 4)
    assert(loaded.cb.books.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.cb.books.map(_.map(_.toSeq).toSeq).toSeq)
    val a = idx.topK(queries, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val b = loaded.topK(queries, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(a == b)
  }

  test("load is loud on a mutated meta (missing column) and an empty books table") {
    val dir = java.nio.file.Files.createTempDirectory("pqbad").toString
    val idx = Pq.PqIndex.build(embeddings, "embedding", "vec_id", m = 8, ksub = 8)
    idx.save(dir)
    // drop a column and re-save the books table (materialize first —
    // overwriting a lazily-read path would race the scan)
    val rows = spark.read.parquet(s"$dir/books")
      .select("s", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    rows.toSeq.toDF("s", "centroid")
      .write.mode("overwrite").parquet(s"$dir/books")
    val e = intercept[IllegalArgumentException] { Pq.PqIndex.load(spark, dir) }
    assert(e.getMessage.contains("missing field"))
  }

  test("append encodes with FROZEN codebooks; remove(append(build(A), B), ids(B)) == build(A)") {
    val a = embeddings.filter(col("vec_id") % 3 =!= 0)
    val b = embeddings.filter(col("vec_id") % 3 === 0)
    val built = Pq.PqIndex.build(a, "embedding", "vec_id", m = 8, ksub = 8)
    val appended = built.append(b, "embedding", "vec_id")
    // appended ids are searchable
    val ids = appended.codes.select("neighbor_id").as[Long].collect().toSet
    assert(b.select("vec_id").as[Long].collect().forall(ids.contains))
    // codebooks unchanged by append
    assert(appended.cb.books.map(_.map(_.toSeq).toSeq).toSeq ==
      built.cb.books.map(_.map(_.toSeq).toSeq).toSeq)
    // remove inverts append exactly (codes frame equality via symmetric diff)
    val restored = appended.remove(b.select(col("vec_id")))
    assert(restored.codes.exceptAll(built.codes).isEmpty &&
      built.codes.exceptAll(restored.codes).isEmpty)
    // a removed id can never come back from a search
    val got = appended.remove(b.select(col("vec_id")))
      .topK(queries, "embedding", "vec_id", 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got.intersect(b.select("vec_id").as[Long].collect().toSet).isEmpty)
  }

  test("equal-code rows score bit-identically (ADC sums the same lookups in the same order)") {
    val df = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.fill(8)(-0.5f)), (4L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val idx = Pq.PqIndex.build(df, "embedding", "vec_id", m = 4, ksub = 2)
    val out = idx.topK(df.filter(col("vec_id") === 4), "embedding", "vec_id", 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) == out(2L)) // identical vectors → identical codes → exactly equal adist
  }
}
