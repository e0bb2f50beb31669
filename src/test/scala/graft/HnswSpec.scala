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
