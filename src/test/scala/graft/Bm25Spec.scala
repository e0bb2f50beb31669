package graft

import org.apache.spark.sql.functions._
import graft.operators.Bm25

/** BM25: hand-computed scores on a tiny fixture, ranking/tie rules,
  * and the operator's contract edges (absent terms, k cap, empty
  * queries). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4 docs: "cat" in 2 docs, "dog" in 1, "fish" in none; doc 10 repeats
  // "cat" (tf=2) but is longer.
  private def corpus = Seq(
    (10L, "cat cat mat mat mat mat"),
    (11L, "cat hat"),
    (12L, "dog hat"),
    (13L, "rug mat")).toDF("doc_id", "text")

  private def queriesDf(qs: (Long, String)*) = qs.toDF("query_id", "qtext")

  test("matches the BM25 formula computed by hand") {
    val out = Bm25.topK(corpus, "text", "doc_id",
      queriesDf((0L, "cat")), "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // N=4, avgdl=(6+2+2+2)/4=3, df(cat)=2 → idf=log2(1+2.5/2.5)=1
    val k1 = 1.2; val b = 0.75
    def s(tf: Int, dl: Int): Double = {
      val raw = 1.0 * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / 3.0))
      math.floor(raw * 1e4 + 0.5) / 1e4
    }
    assert(out.keySet == Set(10L, 11L))
    assert(math.abs(out(10L) - s(2, 6)) < 1e-12)
    assert(math.abs(out(11L) - s(1, 2)) < 1e-12)
    // shorter doc with tf=1 beats longer doc with tf=2 here? verify the
    // actual ordering is by the formula, not an assumption
    val ranked = Bm25.topK(corpus, "text", "doc_id",
      queriesDf((0L, "cat")), "query_id", "qtext", k = 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val expected = Seq(10L, 11L).sortBy(id => -out(id))
    assert(ranked == expected)
  }

  test("multi-term scores add per term; absent terms contribute nothing") {
    val one = Bm25.topK(corpus, "text", "doc_id",
      queriesDf((0L, "cat"), (1L, "hat")), "query_id", "qtext", k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val both = Bm25.topK(corpus, "text", "doc_id",
      queriesDf((0L, "cat hat fish")), "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getDouble(3)))).toMap
    // doc 11 has both terms → n_terms=2, score ≈ cat + hat single-term
    // scores (4dp rounding applied after the sum, so allow 1e-4 slack)
    assert(both(11L)._1 == 2L)
    assert(math.abs(both(11L)._2 -
      (one((0L, 11L)) + one((1L, 11L)))) < 2e-4)
    // "fish" appears nowhere: no doc gains from it, and a fish-only
    // query returns nothing
    val fish = Bm25.topK(corpus, "text", "doc_id",
      queriesDf((0L, "fish")), "query_id", "qtext", k = 10)
    assert(fish.count() == 0)
  }

  test("k caps results; rank ties break by ascending doc id") {
    // docs 11 and 12 are structurally identical for "hat" (tf=1, dl=2)
    val out = Bm25.topK(corpus, "text", "doc_id",
      queriesDf((0L, "hat")), "query_id", "qtext", k = 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 11L, "equal scores must break ties by id")
    assert(out.head.getInt(4) == 1)
  }

  test("rejects token-free query sets") {
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "text", "doc_id",
        queriesDf((0L, "!!! ???")), "query_id", "qtext", k = 5)
    }
  }

  test("index path equals ad-hoc topK; save/load round-trips") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = queriesDf((0L, "spark hash join"), (1L, "window sort merge"),
      (2L, "table scan filter"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val adhoc = norm(Bm25.topK(docs, "text", "doc_id",
      qs, "query_id", "qtext", k = 10))
    val idx = Bm25.Bm25Index.build(docs, "text", "doc_id")
    assert(norm(idx.topK(qs, "query_id", "qtext", k = 10)) == adhoc)
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    idx.save(dir)
    val loaded = Bm25.Bm25Index.load(spark, dir)
    assert(loaded.idCol == "doc_id")
    assert(norm(loaded.topK(qs, "query_id", "qtext", k = 10)) == adhoc)
    // meta mutation (the LshIndex.load discipline): dropping a field
    // must fail at load naming it, not serve wrong idf statistics
    import spark.implicits._
    Seq((loaded.nDocs, "doc_id")).toDF("n_docs", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] { Bm25.Bm25Index.load(spark, dir) }
    assert(e.getMessage.contains("sum_dl"))
  }

  test("append(A, B) equals build(A ∪ B): stats, df table, and scores") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val appended = Bm25.Bm25Index.build(a, "text", "doc_id").append(b, "text")
    val full = Bm25.Bm25Index.build(docs, "text", "doc_id")
    // exact stat merge (the reason meta stores sumDl, not avgdl)
    assert(appended.nDocs == full.nDocs)
    assert(appended.sumDl == full.sumDl)
    def dfSet(i: Bm25.Bm25Index) = i.dfTab
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getAs[Int]("__bucket"))).toSet
    assert(dfSet(appended) == dfSet(full))
    val qs = queriesDf((0L, "spark hash join"), (1L, "window sort merge"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(norm(appended.topK(qs, "query_id", "qtext", k = 10))
      == norm(full.topK(qs, "query_id", "qtext", k = 10)))
    intercept[IllegalArgumentException] {
      full.append(docs.where(lit(false)), "text")
    }
  }

  test("remove(build(A∪B), B) equals build(A): stats, df table, postings, scores") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val removed = Bm25.Bm25Index.build(docs, "text", "doc_id").remove(b, "text")
    val rebuilt = Bm25.Bm25Index.build(a, "text", "doc_id")
    assert(removed.nDocs == rebuilt.nDocs && removed.sumDl == rebuilt.sumDl)
    def dfSet(i: Bm25.Bm25Index) = i.dfTab
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getAs[Int]("__bucket"))).toSet
    assert(dfSet(removed) == dfSet(rebuilt))
    def postSet(i: Bm25.Bm25Index) = i.postings
      .select("doc_id", "term", "tf", "__dl")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(postSet(removed) == postSet(rebuilt))
    val qs = queriesDf((0L, "spark hash join"), (1L, "window sort merge"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(norm(removed.topK(qs, "query_id", "qtext", k = 10))
      == norm(rebuilt.topK(qs, "query_id", "qtext", k = 10)))
    // removing everything is refused (avgdl undefined)
    intercept[IllegalArgumentException] {
      Bm25.Bm25Index.build(docs, "text", "doc_id").remove(docs, "text")
    }
  }

  test("driver-side term bucket matches the engine-side bucket column") {
    val terms = Seq("spark", "hash", "join", "the", "zz9", "merge", "a1b2")
    val engine = terms.toDF("term")
      .select(col("term"), pmod(graft.functions.TextFunctions.portableHash(col("term")),
        lit(Bm25.Bm25Index.NumBuckets.toLong)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(Bm25.Bm25Index.bucketOf(t) == engine(t),
        s"bucket mismatch for '$t'")
    }
  }

  test("deterministic under repartitioning (decimal-summed contributions)") {
    val qs = queriesDf((0L, "cat mat hat"), (1L, "dog rug"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Bm25.topK(df, "text", "doc_id", qs, "query_id", "qtext", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
          r.getInt(4))).toSet
    assert(run(corpus) == run(corpus.repartition(7)))
  }
}
