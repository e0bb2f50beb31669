package graft

import graft.operators.{Bq, Similarity}
import org.apache.spark.sql.functions._

/** Binary quantization: hand-computed packing, Hamming metric laws,
  * the refine repair, zero-vector totality. The q_similarity_bq gate
  * pins the whole integer path against DuckDB with no constants. */
class BqSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("sign packing: hand-computed words, ±0 both pack set, >64 dims span words") {
    // dims 0..5: +,-,+,+,-,0 → bits 0,2,3,5 set = 0b101101 = 45
    val df = Seq((1L, Array(0.5, -1.0, 2.0, 0.1, -0.2, 0.0))).toDF("id", "v")
    val got = df.select(Bq.signBits(col("v").cast("array<double>"), 6).as("b"))
      .head().getSeq[Long](0)
    assert(got == Seq(45L))
    // 65 dims → two words; dim 64 (second word bit 0) negative → word1 = 0
    val long1 = Array.fill(65)(1.0); long1(64) = -1.0
    val got2 = Seq((1L, long1)).toDF("id", "v")
      .select(Bq.signBits(col("v").cast("array<double>"), 65).as("b"))
      .head().getSeq[Long](0)
    assert(got2 == Seq(-1L, 0L)) // word0 all 64 bits set, word1 bit 0 clear
  }

  test("hamming: zero on self, symmetric, counts flipped signs") {
    val df = Seq(
      (1L, Array(1.0, 1.0, 1.0, 1.0)),
      (2L, Array(1.0, -1.0, 1.0, -1.0))).toDF("id", "v")
    val b = df.select(col("id"), Bq.signBits(col("v").cast("array<double>"), 4).as("b"))
    val a1 = b.filter(col("id") === 1).select(col("b").as("x"))
    val a2 = b.filter(col("id") === 2).select(col("b").as("y"))
    val h = a1.crossJoin(a2).select(Bq.hamming(col("x"), col("y")).as("h"))
      .head().getInt(0)
    assert(h == 2)
    val h0 = a1.crossJoin(a1.select(col("x").as("y")))
      .select(Bq.hamming(col("x"), col("y")).as("h")).head().getInt(0)
    assert(h0 == 0)
  }

  test("refine repairs Hamming recall and never loses it; gate recall bands hold") {
    val q = embeddings.filter(col("vec_id") < 6)
    val brute = Similarity.bruteForceTopK(embeddings, q, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").join(brute, Seq("query_id", "neighbor_id"))
        .count().toDouble / brute.count()
    val plain = recall(Bq.topK(embeddings, q, "embedding", "vec_id", 10, dim = 64))
    val ref = recall(Bq.topK(embeddings, q, "embedding", "vec_id", 10, dim = 64,
      refine = 64))
    assert(ref >= plain, s"refine ($ref) must not lose recall vs Hamming ($plain)")
    assert(ref > 0.3, s"refine(64) recall $ref below any useful band")
  }

  test("zero vectors are total: pack to all-set, rank deterministically") {
    val df = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, -1.0f)),
      (2L, Array(-1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Bq.topK(df, df.filter(col("vec_id") === 1), "embedding",
      "vec_id", k = 2, dim = 2).collect()
    assert(out.length == 2) // no throw, both non-self neighbors ranked
  }
}
