package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Product quantization (PQ) for embedding search — the memory story of
  * ANN at 100 TB (Jégou, Douze, Schmid 2011, "Product quantization for
  * nearest neighbor search", IEEE TPAMI 33(1)). A d-dim float vector
  * (d·4 bytes) compresses to m byte-sized codes: each of m subspaces of
  * d/m dims gets its own ksub-entry codebook (fit like the IVF
  * quantizer — deterministic, layout-invariant, bounded sample), and a
  * vector's code is its per-subspace argmin entry. At the gate shape
  * (d=64, m=8, ksub=16) that is 256 bytes → 8 ints (8 bytes packed) —
  * 32×. A billion-vector corpus whose raw embeddings need 256 GB serves
  * from 8 GB of codes — the difference between "fits in cluster memory"
  * and "doesn't".
  *
  * Search is the asymmetric-distance scan (ADC): each QUERY computes a
  * lookup table of squared L2 distances from its subvectors to every
  * codebook entry ONCE (m·ksub doubles, map-side, queries ≪ corpus);
  * each corpus row then scores with m table lookups
  * ([[graft.plans.PqAdcExpr]] — a fused codegen loop) instead of d
  * multiplies. The scan shape matches [[Similarity.bruteForceTopK]]
  * (broadcast queries, one corpus pass, no corpus shuffle) but touches
  * 32× less memory per row and does m/d of the arithmetic; `refine > 0`
  * re-ranks the top-`refine` ADC shortlist with exact cosine — the
  * standard production recall repair (IVFADC's "R" step).
  *
  * Everything downstream of the fit is SQL-replayable: encode argmin
  * (first-index-wins ties, index-order squared-L2 sums), LUT, ADC sum in
  * subspace order, (adist asc, neighbor_id) ranking — q_similarity_pq /
  * q_similarity_pq_refine embed the fitted codebooks and replay all of
  * it in DuckDB.
  */
object Pq {

  /** Fitted PQ codebooks: books(s)(c) is subspace s's entry c (dsub
    * doubles). Driver-small: m·ksub·dsub doubles (1024 at the gate
    * shape). */
  final case class Codebooks(books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def ksub: Int = books(0).length
    def dsub: Int = books(0)(0).length
    private[operators] def asSeq: Seq[Seq[Seq[Double]]] =
      books.map(_.map(_.toSeq).toSeq).toSeq
  }

  /** Fit the per-subspace codebooks over UNIT vectors (cosine ranking ≡
    * L2 ranking on the unit sphere, so ADC distances order like cosine).
    * One bounded hash-ordered sample ([[Similarity.hashSample]] — the
    * same layout-invariant recipe as the IVF quantizer fit, shared so
    * both oracles can embed their fitted constants), then an independent
    * sequential Lloyd per subspace on the sliced sample; subspace s
    * seeds with seed+s so codebooks differ deterministically. */
  def fit(corpus: DataFrame, vecCol: String, m: Int = 8, ksub: Int = 16,
      seed: Long = 42L, maxIter: Int = 10): Codebooks = {
    val u = Similarity.withUnitVec(corpus, vecCol, "__uv")
    val sample = Similarity.hashSample(u, "__uv", seed)
    require(sample.nonEmpty, "Pq.fit: empty input")
    val dim = sample(0).length
    require(dim % m == 0,
      s"Pq.fit: dim $dim is not divisible into $m subspaces")
    val dsub = dim / m
    val books = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      Similarity.lloyd(sub, math.min(ksub, sub.length), seed + s, maxIter)
    }
    Codebooks(books)
  }

  /** m-code column for a unit-vector column (fused codegen argmin —
    * [[graft.plans.PqEncodeExpr]]). */
  def encodeCol(unitVec: Column, cb: Codebooks): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PqEncodeExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(unitVec), cb.asSeq))

  /** Query-side ADC lookup table column (m·ksub squared L2 entries,
    * flattened lut[s·ksub + c]). */
  def lutCol(unitVec: Column, cb: Codebooks): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PqLutExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(unitVec), cb.asSeq))

  /** Per-pair ADC distance (m lookups). */
  def adcCol(codes: Column, lut: Column, ksub: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PqAdcExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(codes),
        org.apache.spark.sql.GraftColumnBridge.expression(lut), ksub))

  /** One-shot PQ top-k (fit + encode + scan). Build [[PqIndex]] instead
    * when the corpus is served more than once. `refine > 0` exact-cosine
    * re-ranks the top-`refine` ADC shortlist (needs the corpus vectors —
    * they are joined back only for shortlist rows, ~queries·refine of
    * them, never the full corpus). */
  def topK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      refine: Int = 0): DataFrame = {
    val idx = PqIndex.build(corpus, vecCol, idCol, m, ksub, seed)
    if (refine <= 0) idx.topK(queries, vecCol, idCol, k)
    else idx.refineTopK(corpus, queries, vecCol, idCol, k, refine)
  }

  /** A built PQ index: the codebooks (driver-small) plus the encoded
    * corpus — (neighbor_id, __codes) ONLY, m ints per row; the original
    * vectors are NOT retained (that is the point). Build once, serve
    * many query batches; [[PqIndex#save]]/[[PqIndex.load]] persist it
    * (the LshIndex/IvfIndex/Bm25Index/SpanIndex/EvalIndex family
    * contract). */
  final case class PqIndex private[operators] (
      cb: Codebooks, codes: DataFrame) {

    /** Pure ADC top-k: (query_id, neighbor_id, rank). Rank ascending by
      * approximate squared L2 (unit sphere: 2−2·cos), neighbor_id ties. */
    def topK(queries: DataFrame, vecCol: String, idCol: String, k: Int): DataFrame = {
      val q = Similarity.withUnitVec(queries, vecCol, "__qv")
        .select(col(idCol).as("query_id"), lutCol(col("__qv"), cb).as("__lut"))
      codes.crossJoin(broadcast(q))
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("adist", adcCol(col("__codes"), col("__lut"), cb.ksub))
        .pipe { scored =>
          val w = Window.partitionBy("query_id")
            .orderBy(col("adist").asc, col("neighbor_id"))
          scored.withColumn("rank", row_number().over(w))
            .where(col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adist")
        }
    }

    /** ADC shortlist of `refine` candidates, then exact cosine re-rank
      * to top-k. The corpus frame supplies true vectors for SHORTLIST
      * rows only (a broadcast-sized semi-join at realistic query-batch
      * sizes — queries·refine rows, never the corpus). */
    def refineTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
        idCol: String, k: Int, refine: Int): DataFrame = {
      require(refine >= k, s"refine ($refine) must be ≥ k ($k)")
      val shortlist = topK(queries, vecCol, idCol, refine)
        .select("query_id", "neighbor_id")
      val cv = Similarity.withUnitVec(corpus, vecCol, "__cv")
        .select(col(idCol).as("neighbor_id"), col("__cv"))
      val qv = Similarity.withUnitVec(queries, vecCol, "__qv")
        .select(col(idCol).as("query_id"), col("__qv"))
      val scored = shortlist
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("score",
          Similarity.dot(corpus.sparkSession)(col("__qv"), col("__cv")))
      val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    }

    /** Incremental growth with FROZEN codebooks (the IvfIndex.append
      * contract): one map-side encode pass over the new rows, no refit,
      * no touch of the old codes. remove(append(build(A), B), ids(B)) ==
      * build(A) exactly; rebuild when distribution drift degrades
      * reconstruction error materially. Unique ids across appends are
      * the caller's contract. */
    def append(more: DataFrame, vecCol: String, idCol: String): PqIndex =
      PqIndex(cb, codes.unionByName(PqIndex.encoded(more, vecCol, idCol, cb)))

    /** Takedown/opt-out: drop rows by id (first column of `removedIds`).
      * Codebooks stay frozen — a search can never return a removed id
      * and surviving results are unchanged. */
    def remove(removedIds: DataFrame): PqIndex = {
      val ids = removedIds
        .select(col(removedIds.columns.head).as("neighbor_id")).distinct()
      PqIndex(cb, codes.join(broadcast(ids), Seq("neighbor_id"), "left_anti"))
    }

    /** Persist: `dir/codes` = the encoded corpus (the compressed form IS
      * what ships); `dir/books` = (s, cell, centroid) rows. */
    def save(dir: String): Unit = {
      val spark = codes.sparkSession
      codes.write.mode("overwrite").parquet(s"$dir/codes")
      import spark.implicits._
      (for (s <- 0 until cb.m; c <- 0 until cb.ksub)
        yield (s, c, cb.books(s)(c).toSeq))
        .toDF("s", "cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
    }
  }

  object PqIndex {
    private[operators] def encoded(corpus: DataFrame, vecCol: String,
        idCol: String, cb: Codebooks): DataFrame =
      Similarity.withUnitVec(corpus, vecCol, "__cv")
        .select(col(idCol).as("neighbor_id"),
          encodeCol(col("__cv"), cb).as("__codes"))

    /** Fit the codebooks and encode every corpus row (one distributed
      * map-side pass after the sampled fit). */
    def build(corpus: DataFrame, vecCol: String, idCol: String,
        m: Int = 8, ksub: Int = 16, seed: Long = 42L,
        maxIter: Int = 10): PqIndex = {
      val cb = fit(corpus, vecCol, m, ksub, seed, maxIter)
      // serve-many: every query batch scans the codes, so retain them
      // (the LshIndex/IvfIndex build discipline) instead of re-encoding
      // the corpus per batch
      PqIndex(cb, graft.core.CacheScope.retain(
        encoded(corpus, vecCol, idCol, cb)))
    }

    /** Restore a saved index — by-name validated loads (the
      * LshIndex.load discipline): a reordered or extended schema cannot
      * silently swap subspace ids for coordinates. */
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): PqIndex = {
      val bookDf = spark.read.parquet(s"$dir/books")
      val missing = Seq("s", "cell", "centroid").filterNot(bookDf.columns.contains)
      require(missing.isEmpty,
        s"PqIndex.load: $dir/books is missing field(s) ${missing.mkString(", ")} — " +
          s"not a saved PqIndex (have: ${bookDf.columns.mkString(", ")})")
      val rows = bookDf.collect()
        .map(r => (r.getAs[Int]("s"), r.getAs[Int]("cell"),
          r.getAs[Seq[Double]]("centroid").toArray))
      require(rows.nonEmpty, s"PqIndex.load: $dir/books is empty — corrupt index")
      val m = rows.map(_._1).max + 1
      val ksub = rows.map(_._2).max + 1
      require(rows.length == m * ksub,
        s"PqIndex.load: $dir/books has ${rows.length} entries, expected $m×$ksub — corrupt index")
      val books = Array.ofDim[Array[Double]](m, ksub)
      rows.foreach { case (s, c, ctr) => books(s)(c) = ctr }
      PqIndex(Codebooks(books.map(_.toArray)), spark.read.parquet(s"$dir/codes"))
    }
  }
}
