package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Similarity}

/** Sharded HNSW graph ANN: recall against the exact brute-force path,
  * determinism, and the single-shard graph's own behavior. */
class HnswSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("recall@10 vs brute force is >= 0.9 on the gate embeddings") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Hnsw.topK(emb, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("output is deterministic across runs") {
    val queries = emb.filter(col("vec_id") < 8)
    def run() = Hnsw.topK(emb, queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run() == run())
  }

  test("single graph: exact top-1 recovery of an inserted vector") {
    val rng = new scala.util.Random(7)
    val dim = 16
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val vecs = Array.fill(300)(unit())
    val g = new Hnsw.Graph(dim, m = 8, efConstruction = 100, seed = 1L)
    vecs.foreach(g.insert)
    assert(g.size == 300)
    // querying WITH a stored vector must return that vector first
    // (cosine 1 with itself beats everything else w.h.p.)
    (0 until 300 by 29).foreach { i =>
      val hits = g.search(vecs(i), k = 1, efSearch = 50)
      assert(hits.head._1 == i, s"query $i returned ${hits.head}")
      assert(math.abs(hits.head._2 - 1.0) < 1e-9)
    }
  }

  test("HnswIndex: build -> save -> load serves the same results as direct topK") {
    val queries = emb.filter(col("vec_id") < 8)
    val direct = Hnsw.topK(emb, queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val idx = Hnsw.HnswIndex.build(emb, "embedding", "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("hnsw-idx").toString
    idx.save(dir)
    val loaded = Hnsw.HnswIndex.load(spark, dir)
    val served = loaded.topK(queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == direct,
      s"index served ${served.size} rows, direct ${direct.size}")
  }

  test("HnswIndex.append: shard membership == rebuild-over-union; recall in the gate band; deterministic") {
    val a = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val b = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    val appended = Hnsw.HnswIndex.build(a, "embedding", "vec_id")
      .append(b, "embedding", "vec_id")
    val rebuilt = Hnsw.HnswIndex.build(emb, "embedding", "vec_id")
    // routing parity: append's pmod(murmur3_hash(id), n) is the same
    // partition function repartition(n, id) used at build, so per-shard
    // id membership after append is EXACTLY a rebuild's — the exact
    // part of the law (graph edges may differ; that's the approximate
    // part, bounded by the recall assertion below)
    def membership(ix: Hnsw.HnswIndex) = ix.shards
      .select(col("shard"), explode(col("ids")).as("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(membership(appended) == membership(rebuilt))
    // the appended union is searchable at the q_ann_recall gate band
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def served(ix: Hnsw.HnswIndex) = ix.topK(queries, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = served(appended)
    val recall = (exact & hits).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 after append = $recall")
    // determinism: the same append replays to identical results
    assert(served(Hnsw.HnswIndex.build(a, "embedding", "vec_id")
      .append(b, "embedding", "vec_id")) == hits)
  }

  test("HnswIndex.append routes to previously-EMPTY shards with a fresh graph") {
    import spark.implicits._
    // 3 vectors into 16 shards -> most shards empty; the appended vector
    // lands alone in its own shard and must still be servable
    val base = (0L until 3L).map(i =>
      (i, Array.tabulate(8)(d => if (d == i % 8) 1.0f else 0.0f).toSeq))
      .toDF("vec_id", "embedding")
    val idx = Hnsw.HnswIndex.build(base, "embedding", "vec_id", shards = 16)
    val extra = Seq((100L, Array.tabulate(8)(d => if (d == 3) 1.0f else 0.0f).toSeq))
      .toDF("vec_id", "embedding")
    val appended = idx.append(extra, "embedding", "vec_id")
    val rebuilt = Hnsw.HnswIndex.build(
      base.unionByName(extra), "embedding", "vec_id", shards = 16)
    def membership(ix: Hnsw.HnswIndex) = ix.shards
      .select(col("shard"), explode(col("ids")).as("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(membership(appended) == membership(rebuilt))
    // a query AT the new vector must find it first
    val q = extra.withColumn("vec_id", lit(999L))
    val top = appended.topK(q, "embedding", "vec_id", k = 1).collect()
    assert(top.length == 1 && top.head.getLong(1) == 100L)
  }

  test("HnswIndex: append -> save -> load round-trip; mutated meta fails loudly") {
    val a = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val b = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    val queries = emb.filter(col("vec_id") < 8)
    val appended = Hnsw.HnswIndex.build(a, "embedding", "vec_id")
      .append(b, "embedding", "vec_id")
    val direct = appended.topK(queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("hnsw-app-idx").toString
    appended.save(dir)
    val loaded = Hnsw.HnswIndex.load(spark, dir)
    assert(loaded.numShards == appended.numShards && loaded.m == appended.m)
    val served = loaded.topK(queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == direct)
    // meta mutation: dropping num_shards must fail at load naming the field
    import spark.implicits._
    Seq((16, 200, 42L)).toDF("m", "ef_construction", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] { Hnsw.HnswIndex.load(spark, dir) }
    assert(e.getMessage.contains("num_shards"))
  }

  test("empty and tiny shards do not break the distributed merge") {
    import spark.implicits._
    val tiny = (0L until 5L).map(i =>
      (i, Array.tabulate(8)(d => if (d == i % 8) 1.0f else 0.0f).toSeq))
      .toDF("vec_id", "embedding")
    // more shards than rows: most shards are empty
    val out = Hnsw.topK(tiny, tiny.filter(col("vec_id") === 0), "embedding", "vec_id",
      k = 3, shards = 16)
      .collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(0) == 0L))
  }
}
