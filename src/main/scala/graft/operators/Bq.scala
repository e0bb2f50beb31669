package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization for embedding search — the cheapest
  * point on the ANN compression curve (the "BQ" mode of production
  * vector stores): each dimension of the UNIT vector keeps only its
  * sign, packed 64 bits to a long ([[graft.plans.SignPackExpr]] — ONE
  * long at dim 64, 64× under float32, 4× under even PQ codes), and
  * similarity is ranked by Hamming distance (popcount of xor — for
  * unit vectors E[hamming] is monotone in the angle, the
  * random-hyperplane bound of Goemans–Williamson / Charikar 2002 with
  * the coordinate basis as the hyperplanes).
  *
  * Everything is INTEGER arithmetic after the sign: the
  * q_similarity_bq oracle replays packing, xor, popcount and the
  * (hamming, id) ranking bit-exactly — no embedded constants, no
  * cross-engine float margins, the only ANN gate with a constant-free
  * FULL oracle. `refine` re-ranks the Hamming shortlist by exact
  * cosine (recall measured in q_ann_recall like every other method).
  */
object Bq {

  /** Packed sign-bit column (⌈dim/64⌉ longs). */
  def signBits(unitVec: Column, dim: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.SignPackExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(unitVec), dim))

  /** Hamming distance between two packed sign columns (Σ popcount(xor)
    * over the words — ⌈dim/64⌉ lambda steps per pair). */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  /** Hamming top-k: (query_id, neighbor_id, rank, hamming). Rank by
    * (hamming asc, neighbor_id) — a total integer order, identical in
    * any engine. `refine > 0` exact-cosine re-ranks the top-`refine`
    * Hamming shortlist. */
  def topK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, dim: Int, refine: Int = 0): DataFrame = {
    val c = Similarity.withUnitVec(corpus, vecCol, "__cv")
      .select(col(idCol).as("neighbor_id"), col("__cv"),
        signBits(col("__cv"), dim).as("__cb"))
    val q = Similarity.withUnitVec(queries, vecCol, "__qv")
      .select(col(idCol).as("query_id"), col("__qv"),
        signBits(col("__qv"), dim).as("__qb"))
    val scored = c.select("neighbor_id", "__cb")
      .crossJoin(broadcast(q.select("query_id", "__qb")))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming", hamming(col("__cb"), col("__qb")))
    val w = Window.partitionBy("query_id").orderBy(col("hamming").asc, col("neighbor_id"))
    val shortlist = scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= math.max(k, refine))
    if (refine <= 0)
      shortlist.where(col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "hamming")
    else {
      val rescored = shortlist.select("query_id", "neighbor_id")
        .join(c.select(col("neighbor_id"), col("__cv")), Seq("neighbor_id"))
        .join(broadcast(q.select(col("query_id"), col("__qv"))), Seq("query_id"))
        .withColumn("score",
          Similarity.dot(corpus.sparkSession)(col("__qv"), col("__cv")))
      val w2 = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
      rescored.withColumn("rank", row_number().over(w2))
        .where(col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    }
  }
}
