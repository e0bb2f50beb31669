package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) —
  * north-star extension. Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast
  *    (queries ≪ corpus); the corpus side streams map-side — one scan, no
  *    corpus shuffle, a per-query top-k via window. The baseline and the
  *    verifier for the approximate path.
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit sketches bucket the
  *    corpus; candidates = bucket collisions in any of `tables` independent
  *    tables; exact cosine re-rank inside candidates. At 100 TB this
  *    replaces the full scan per query with `tables` hash-joins.
  *
  * Cosine math is pure expressions (zip_with/aggregate — codegen'd,
  * vectorizable); hyperplanes are generated from a fixed seed so sketches
  * are deterministic and reusable across runs (write once, join often).
  */
object Similarity {

  /** Cosine similarity of two double-array columns (expression-only). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Exact cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Sign-bit sketch: one bit per seeded pseudo-random hyperplane.
    * Hyperplane components are derived from xxhash64(dim, plane, seed) —
    * deterministic, no stored model. */
  def hyperplaneSketch(vec: Column, dim: Int, bits: Int, seed: Int): Column =
    (0 until bits).map { p =>
      val dot = (0 until dim).map { d =>
        // hash → uniform in [-1,1): deterministic "random" hyperplane
        val h = xxhash64(lit(d), lit(p), lit(seed))
        element_at(vec, d + 1) * (pmod(h, lit(2000000L)).cast("double") / 1000000.0 - 1.0)
      }.reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k via multi-table hyperplane LSH + exact re-rank. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, dim: Int, bits: Int = 12, tables: Int = 6): DataFrame = {
    def sketched(df: DataFrame, id: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      val withTables = (0 until tables).foldLeft(
        df.select(col(idCol).as(id), v.as(s"__v_$id"))) { (acc, t) =>
        acc.withColumn(s"__b_$t", hyperplaneSketch(col(s"__v_$id"), dim, bits, t * 7919))
      }
      withTables.select(col(id), col(s"__v_$id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("table"), col(s"__b_$t").as("bucket"))): _*)).as("e"))
        .select(col(id), col(s"__v_$id"), col("e.table"), col("e.bucket"))
    }
    val c = sketched(corpus, "neighbor_id")
    val q = sketched(queries, "query_id")
    val cands = c.join(q, Seq("table", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "__v_query_id", "__v_neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("score", cosine(col("__v_query_id"), col("__v_neighbor_id")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Embedding-cosine near-duplicate pairs ≥ threshold. Exact variant:
    * block-nested self-join (adequate to ~10⁵ rows); scale variant via
    * [[lshTopK]]-style bucketing when `approximate`. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, approximate: Boolean = false, dim: Int = 64): DataFrame = {
    if (!approximate) {
      val a = df.select(col(idCol).as("id_a"), col(vecCol).cast("array<double>").as("__va"))
      val b = df.select(col(idCol).as("id_b"), col(vecCol).cast("array<double>").as("__vb"))
      a.crossJoin(b).where(col("id_a") < col("id_b"))
        .withColumn("cosine", cosine(col("__va"), col("__vb")))
        .where(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    } else {
      def sk(d: DataFrame, id: String): DataFrame = {
        val v = col(vecCol).cast("array<double>")
        val base = d.select(col(idCol).as(id), v.as(s"__v_$id"))
        (0 until 8).foldLeft(base) { (acc, t) =>
          acc.withColumn(s"__b_$t", hyperplaneSketch(col(s"__v_$id"), dim, 10, t * 104729))
        }.select(col(id), col(s"__v_$id"),
          explode(array((0 until 8).map(t =>
            struct(lit(t).as("table"), col(s"__b_$t").as("bucket"))): _*)).as("e"))
          .select(col(id), col(s"__v_$id"), col("e.table"), col("e.bucket"))
      }
      sk(df, "id_a").join(sk(df, "id_b"), Seq("table", "bucket"))
        .where(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("cosine", cosine(col("__v_id_a"), col("__v_id_b")))
        .where(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    }
  }
}
