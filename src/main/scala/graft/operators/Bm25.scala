package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

import graft.functions.TextFunctions

/** BM25 lexical retrieval over a document corpus — the keyword-side
  * complement of the embedding ANN family ([[Similarity]], [[Hnsw]]). A
  * training-data pipeline reaches for this when screening a corpus
  * against eval-set queries (retrieval-based decontamination), mining
  * hard negatives for retriever training, or auditing what a corpus
  * contains for a topic.
  *
  * Scoring follows the Lucene/Robertson formulation with one deliberate
  * deviation: idf uses log2 instead of ln. log2 of a ratio of integers is
  * the one transcendental this repo has already proven bit-identical
  * across engines (q_lm_perplexity), and a positive constant factor
  * (1/ln 2) rescales every score equally — rankings are unchanged.
  *
  *   idf(t)      = log2(1 + (N - df + 0.5) / (df + 0.5))
  *   score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
  *
  * Scale shape (the part that matters at 100 TB):
  *   - per-doc term frequencies are computed MAP-SIDE inside the scan
  *     (array_distinct + filter-count over the token array — no
  *     groupBy(doc, term) shuffle to build postings). The O(distinct·len)
  *     per-row cost is the trade for zero shuffle; documents are
  *     bounded-length after curation, so it holds.
  *   - the query set is small by definition and BROADCAST twice: once to
  *     prune postings to query terms (a broadcast semi-join inside the
  *     scan — the corpus never shuffles wide), once to attach idf.
  *   - [[topK]] computes df ONLY for query terms, from the pruned
  *     postings — never a full corpus vocabulary aggregation. For
  *     repeated query batches, [[Bm25Index.build]] pays the full
  *     postings/df build ONCE and persists them partitioned by a term
  *     bucket, so each later batch reads only its terms' partitions.
  *   - the only shuffle is the partial-aggregated (query_id, doc_id)
  *     score sum over narrow matched rows, then a per-query top-k window
  *     over scored candidates (rows that share ≥1 term with the query).
  *   - per-term contributions go through exact decimal summation
  *     ([[graft.Tables.dsum]]) so the score is independent of partition
  *     order and reproducible by an external engine.
  *
  * Reference relationship: the reference has no retrieval operator; this
  * extends the training-pipeline surface (SURVEY.md §2.13) alongside
  * decontamination (Dedup.scala) which it complements at query-time
  * granularity.
  */
object Bm25 {

  /** Per-document postings, computed map-side — no shuffle. `terms`
    * (optional) restricts to a term prune-list. Output: (idCol, __dl,
    * term, tf). */
  private def postings(corpus: DataFrame, textCol: String, idCol: String,
      terms: Option[Column]): DataFrame = {
    val toks = TextFunctions.tokens(TextFunctions.normalizeText(col(textCol)))
    val hit = terms match {
      case Some(t) => array_intersect(array_distinct(col("__toks")), t)
      case None => array_distinct(col("__toks"))
    }
    corpus.select(col(idCol), toks.as("__toks"))
      .withColumn("__dl", size(col("__toks")))
      .withColumn("__hit", hit)
      .where(size(col("__hit")) > 0)
      .select(col(idCol), col("__dl"),
        explode(col("__hit")).as("term"), col("__toks"))
      .withColumn("tf", size(filter(col("__toks"), t => t === col("term"))))
      .drop("__toks")
  }

  /** Normalized, per-query-distinct (queryIdCol, term) rows. */
  private def queryTerms(queries: DataFrame, queryIdCol: String,
      queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol),
      explode(array_distinct(TextFunctions.tokens(
        TextFunctions.normalizeText(col(queryTextCol))))).as("term"))

  /** Shared scoring tail: matched postings × query terms × df → decimal-
    * summed BM25, 4dp-rounded BEFORE ranking, per-query top-k window
    * (ties break by ascending doc id). */
  private def scoreAndRank(post: DataFrame, qterms: DataFrame,
      dfTab: DataFrame, nDocs: Long, avgdl: Double,
      queryIdCol: String, idCol: String, k: Int, k1: Double,
      b: Double): DataFrame = {
    val idf = log2(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf *
      (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl)))
    val scored = post
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfTab), Seq("term"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        graft.Tables.dsum(contrib, 12).as("__s"))
      .withColumn("score", floor(col("__s") * 1e4 + 0.5) / 1e4)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("n_terms"), col("score"),
        col("rank"))
  }

  /** Top-k BM25 hits per query, ad hoc (no prebuilt index). `queries` is
    * a small frame of (queryIdCol, queryTextCol) — it is collected to
    * build the term prune-list and broadcast into every join; keep it
    * query-sized (thousands, not millions).
    *
    * Output: (queryIdCol, idCol, n_terms, score, rank) — score rounded
    * to 4 decimals (floor(x·1e4+0.5)/1e4, the repo's canonical rounding)
    * BEFORE ranking so ties break identically everywhere; rank ties
    * break by ascending doc id. */
  def topK(corpus: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
    val termList = qterms.select("term").distinct()
      .collect().map(_.getString(0)).sorted
    require(termList.nonEmpty, "queries contain no tokens")

    val input = graft.core.CacheScope.retainInput(corpus)
    // greatest(·,0) in the stats absorbs null-text rows (length-0 docs);
    // the coalesce'd sum keeps an empty corpus readable so this guard
    // fires instead of a Row.getLong NPE
    val (nDocs, sumDl) = Bm25Index.corpusStats(input, textCol)
    require(nDocs > 0, "empty corpus")
    val post = graft.core.CacheScope.retain(postings(input, textCol, idCol,
      Some(array(termList.map(lit): _*))))
    // df per query term from the pruned postings ((id, term) is unique
    // by construction), broadcast back — bounded by the query vocabulary
    val dfTab = post.groupBy("term").agg(count(lit(1)).as("df"))
    scoreAndRank(post, qterms, dfTab, nDocs, sumDl.toDouble / nDocs.toDouble,
      queryIdCol, idCol, k, k1, b)
  }

  /** A prebuilt, persistable BM25 index (the [[Similarity.IvfIndex]] /
    * [[Hnsw.HnswIndex]] build-once/serve-many pattern): full map-side
    * postings plus the full (term, df) table, each carrying a
    * portable-hash term bucket. [[save]] partitions both by bucket, so a
    * later query batch prunes its scan to the partitions its terms hash
    * into instead of re-reading the corpus. Identical output to [[topK]]
    * for the same corpus and queries (Bm25Spec pins the equality).
    *
    * Corpus-level stats are kept as (nDocs, sumDl) — not the derived
    * avgdl — so [[append]] merges exactly: n and Σdl add; an avgdl
    * stored pre-divided would make append(A,B) ≠ build(A∪B) by an ulp. */
  final case class Bm25Index(postings: DataFrame, dfTab: DataFrame,
      nDocs: Long, sumDl: Long, idCol: String) {

    def avgdl: Double = sumDl.toDouble / nDocs.toDouble

    /** Merge an increment into this index WITHOUT touching the existing
      * postings (append-only by construction): the increment pays its
      * own map-side postings pass + one term-level df aggregation, the
      * stats add exactly, and the merged df re-aggregates only the
      * narrow (term, df) union — never the postings. Ids must be
      * disjoint from the existing corpus (same contract as rebuilding
      * over a union). Bm25Spec pins append(A,B) == build(A ∪ B). */
    def append(increment: DataFrame, textCol: String): Bm25Index = {
      val input = graft.core.CacheScope.retainInput(increment)
      val (n2, sum2) = Bm25Index.corpusStats(input, textCol)
      require(n2 > 0, "empty increment")
      val post2 = Bm25.postings(input, textCol, idCol, None)
        .withColumn("__bucket", Bm25Index.bucketCol)
      val df2 = post2.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("__bucket", Bm25Index.bucketCol)
      val mergedDf = dfTab.unionByName(df2)
        .groupBy("term", "__bucket").agg(sum("df").as("df"))
      Bm25Index(postings.unionByName(post2), mergedDf,
        nDocs + n2, sumDl + sum2, idCol)
    }

    def topK(queries: DataFrame, queryIdCol: String, queryTextCol: String,
        k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
      require(k > 0, "k must be positive")
      val qterms = queryTerms(queries, queryIdCol, queryTextCol)
      val termList = qterms.select("term").distinct()
        .collect().map(_.getString(0)).sorted
      require(termList.nonEmpty, "queries contain no tokens")
      val buckets = termList.map(Bm25Index.bucketOf).distinct.sorted
      // bucket prune first (partition pruning on a saved index), then
      // the exact term filter
      def prune(df: DataFrame): DataFrame = df
        .where(col("__bucket").isin(buckets.map(Int.box): _*))
        .where(col("term").isin(termList: _*))
      scoreAndRank(prune(postings), qterms, prune(dfTab).drop("__bucket"),
        nDocs, avgdl, queryIdCol, idCol, k, k1, b)
    }

    /** Forget documents — takedown/opt-out support, [[append]]'s exact
      * inverse: `removedDocs` must be the removed documents AS INDEXED
      * (same id and text — the removal re-derives their postings and
      * length stats to subtract them; a drifted text under-removes).
      * Integer arithmetic end to end, so
      * remove(build(A∪B), B) == build(A) EXACTLY: postings anti-join
      * away, per-term df subtracts (terms reaching 0 drop), and
      * (nDocs, sumDl) subtract — which is why the stats are stored
      * un-divided. Bm25Spec pins frame and topK equality. */
    def remove(removedDocs: DataFrame, textCol: String): Bm25Index = {
      val input = graft.core.CacheScope.retainInput(removedDocs)
      val (n2, sum2) = Bm25Index.corpusStats(input, textCol)
      require(n2 < nDocs,
        "remove would empty the index (avgdl undefined) — rebuild instead")
      val ids = input.select(col(idCol)).distinct()
      val df2 = Bm25.postings(input, textCol, idCol, None)
        .groupBy("term").agg(count(lit(1)).as("__rm"))
      val newDf = dfTab.join(broadcast(df2), Seq("term"), "left")
        .withColumn("df", col("df") - coalesce(col("__rm"), lit(0L)))
        .drop("__rm")
        .where(col("df") > 0)
      Bm25Index(postings.join(broadcast(ids), Seq(idCol), "left_anti"),
        newDf, nDocs - n2, sumDl - sum2, idCol)
    }

    /** Persist under `dir`: postings/ and df/ partitioned by term
      * bucket, meta/ a single row (nDocs, sumDl, idCol). */
    def save(dir: String): Unit = {
      val spark = postings.sparkSession
      postings.write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"$dir/postings")
      dfTab.write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"$dir/df")
      import spark.implicits._
      Seq((nDocs, sumDl, idCol)).toDF("n_docs", "sum_dl", "id_col")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  object Bm25Index {
    val NumBuckets = 64

    /** The portable term-bucket column shared by build and append. */
    private[Bm25] def bucketCol: Column =
      pmod(graft.functions.TextFunctions.portableHash(col("term")),
        lit(NumBuckets.toLong)).cast("int")

    /** (nDocs, Σ document length) in one aggregation; the null-sum
      * coalesce keeps an empty corpus readable so callers' guards fire. */
    private[Bm25] def corpusStats(input: DataFrame, textCol: String): (Long, Long) = {
      val toks = TextFunctions.tokens(TextFunctions.normalizeText(col(textCol)))
      val r = input.agg(count(lit(1)),
        coalesce(sum(greatest(size(toks), lit(0))), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }

    /** Engine/driver-portable term bucket: first 15 hex digits of md5
      * mod [[NumBuckets]] — the same scheme as
      * [[TextFunctions.portableHash]], computable on the driver for
      * partition pruning. */
    private[graft] def bucketOf(term: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % NumBuckets).toInt
    }

    /** Build the full index in one map-side postings pass plus one
      * (term) aggregation for df — the only shuffle, paid once. */
    def build(corpus: DataFrame, textCol: String, idCol: String): Bm25Index = {
      val input = graft.core.CacheScope.retainInput(corpus)
      val (nDocs, sumDl) = corpusStats(input, textCol)
      require(nDocs > 0, "empty corpus")
      val post = Bm25.postings(input, textCol, idCol, None)
        .withColumn("__bucket", bucketCol)
        .pipe(graft.core.CacheScope.retain)
      val dfTab = post.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("__bucket", bucketCol)
      Bm25Index(post, dfTab, nDocs, sumDl, idCol)
    }

    /** Restore a [[build]]-then-[[Bm25Index#save]]d index. */
    def load(spark: SparkSession, dir: String): Bm25Index = {
      // meta BY NAME and validated loudly (the LshIndex.load
      // discipline): a schema evolution cannot silently shift ordinals,
      // and a mutated/truncated meta fails here naming the field — not
      // later as wrong idf statistics
      val metaDf = spark.read.parquet(s"$dir/meta")
      val required = Seq("n_docs", "sum_dl", "id_col")
      val missing = required.filterNot(metaDf.columns.contains)
      require(missing.isEmpty,
        s"Bm25Index.load: $dir/meta is missing field(s) ${missing.mkString(", ")} — " +
          s"not a saved Bm25Index (have: ${metaDf.columns.mkString(", ")})")
      val meta = metaDf.head
      def pos(name: String): Long = {
        val v = meta.getAs[Long](name)
        require(v > 0L, s"Bm25Index.load: $dir/meta has non-positive $name = $v — corrupt meta")
        v
      }
      val idCol = meta.getAs[String]("id_col")
      require(idCol != null && idCol.nonEmpty,
        s"Bm25Index.load: $dir/meta has empty id_col — corrupt meta")
      Bm25Index(spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/df"),
        pos("n_docs"), pos("sum_dl"), idCol)
    }
  }
}
