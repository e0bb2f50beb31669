package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter: fit a smoothed bigram LM on a trusted reference slice (a
  * "clean" source or the target language's wiki shard), then score every
  * document's per-token cross-entropy under that model. Low entropy =
  * looks like the reference; high entropy = boilerplate, lorem-ipsum,
  * wrong language, or garbled extraction. Production pipelines bucket the
  * corpus by this score (keep head/middle, drop tail).
  *
  * Model (deliberately simple so an external SQL engine can re-derive it
  * bit-for-bit — every count is an integer, every probability a ratio of
  * integers):
  *   - vocabulary: top-V reference unigrams by (count DESC, token ASC) —
  *     a deterministic total order; everything else maps to `<unk>`
  *   - bigram counts over consecutive mapped tokens within each reference
  *     doc (no cross-doc bigrams, no BOS/EOS)
  *   - add-one smoothing over the V+1-token event space:
  *     p(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V + 1)
  *     where c1(w1) = Σ_w c(w1,w) (occurrences of w1 at non-final
  *     positions), so unseen contexts fall back to uniform 1/(V+1)
  *   - doc score: entropy_bits = -(1/m) Σ log2 p over the doc's m
  *     consecutive pairs; docs with fewer than 2 tokens score NULL
  *
  * Scale shape: the model is fit on a BOUNDED reference sample (cap the
  * slice upstream — the model's value does not grow with corpus size), so
  * the vocab collects driver-side (V entries → a codegen'd InSet, no join
  * for token mapping) and the bigram/context tables broadcast to the
  * scoring join. Scoring is map-side explode → two broadcast joins →
  * one partial-aggregated shuffle of narrow (doc_id, log2p) rows. Nothing
  * wide ever shuffles; corpus text never leaves its scan partition.
  */
object QualityLm {

  /** Fitted model: driver-held vocab (V strings) + broadcastable bigram
    * and context count frames. All counts are exact integers. */
  final case class LmModel(vocab: Seq[String], bigrams: DataFrame,
      contexts: DataFrame) {
    def vocabSize: Int = vocab.size
  }

  private val Unk = "<unk>"

  /** Normalized whitespace tokens with out-of-vocab tokens collapsed to
    * `<unk>`. An InSet membership test (codegen'd) — no join. */
  private def mappedTokens(textCol: Column, vocab: Seq[String]): Column = {
    val toks = TextFunctions.tokens(TextFunctions.normalizeText(textCol))
    // isInCollection rejects an empty list; an empty vocab (empty
    // reference slice) maps everything to <unk>
    if (vocab.isEmpty) transform(toks, _ => lit(Unk))
    else transform(toks, t => when(t.isInCollection(vocab), t).otherwise(lit(Unk)))
  }

  /** Consecutive (w1, w2) pairs of a mapped token sequence (empty for
    * sequences shorter than 2 — slice length clamped non-negative). */
  private def bigramPairs(toks: Column): Column = {
    val len = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), len), slice(toks, lit(2), len),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Fit the bigram model on a reference slice. `ref` should be a
    * bounded sample of trusted documents — the fit collects V vocab
    * entries to the driver and keeps counts broadcast-sized. */
  def fit(ref: DataFrame, textCol: String, vocabSize: Int = 512): LmModel = {
    require(vocabSize > 0, "vocabSize must be positive")
    // the slice is scanned twice (vocab pass, then bigram pass)
    val input = graft.core.CacheScope.retainInput(ref)
    val vocab = input
      .select(explode(TextFunctions.tokens(
        TextFunctions.normalizeText(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
      .collect().map(_.getString(0)).toSeq
    val bigrams = input
      .select(bigramPairs(mappedTokens(col(textCol), vocab)).as("pairs"))
      .select(explode(col("pairs")).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy("w1").agg(sum("c2").as("c1"))
    // both frames back every scoring join → bounded retention
    LmModel(vocab,
      graft.core.CacheScope.retain(bigrams),
      graft.core.CacheScope.retain(contexts))
  }

  /** Score each document's bigram cross-entropy (bits/token-transition)
    * under the model. Output: (idCol, n_bigrams, entropy_bits) with the
    * entropy canonicalized to 4 decimals via floor(x·1e4 + 0.5)/1e4 —
    * pure IEEE ops, identical across engines given identical inputs.
    * Docs with fewer than 2 tokens are dropped (no transitions to
    * score). */
  def score(docs: DataFrame, textCol: String, idCol: String,
      model: LmModel): DataFrame = {
    val v1 = lit(model.vocabSize.toLong + 1L)
    val pairs = docs
      .select(col(idCol),
        bigramPairs(mappedTokens(col(textCol), model.vocab)).as("pairs"))
      .where(graft.functions.TextFunctions.evalHere(size(col("pairs")) >= 1))
      .select(col(idCol), explode(col("pairs")).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = pairs
      .join(broadcast(model.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(model.contexts), Seq("w1"), "left")
      .withColumn("logp", log2(
        (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + v1).cast("double")))
    // exact decimal summation: order-independent, so the per-doc sum is
    // identical regardless of partitioning (and matches an external
    // engine summing in a different order); scale 12 holds ~200k
    // transitions at log2p ≥ -30 inside Decimal(18,12)'s 10^6 range
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.Tables.dsum(-col("logp"), 12).as("hsum"))
      .select(col(idCol), col("n_bigrams"),
        (floor(col("hsum") / col("n_bigrams") * 1e4 + 0.5) / 1e4)
          .as("entropy_bits"))
  }

  /** Interpolated Kneser–Ney bigram model (Kneser & Ney 1995; the
    * smoothing KenLM — and therefore the actual CCNet filter — uses,
    * here at bigram order with a fixed discount). Every quantity is an
    * integer count except the constant discount, so the q_lm_kneser_ney
    * oracle re-derives the FULL model in SQL:
    *  - c2(w1,w2), c1(w1)=Σc2 as in [[LmModel]]
    *  - n1c(w1) = |{w2 : c2>0}| (distinct continuations — how "open"
    *    the context is, sizing its interpolation weight)
    *  - n1r(w2) = |{w1 : c2>0}| (distinct left-contexts — the
    *    continuation probability's numerator: "how many contexts does
    *    w2 complete", the KN insight that downweights frequent-but-
    *    context-bound tokens)
    *  - T = distinct bigram count
    *
    *   p(w2|w1) = max(c2−D,0)/c1 + D·n1c(w1)/c1 · pCont(w2)   if c1>0
    *            = pCont(w2)                                    otherwise
    *   pCont(w2) = (n1r(w2)+1) / (T+V+1)
    *
    * (pCont is add-one-shifted so a token never seen as a continuation
    * — `<unk>` on a clean reference — keeps nonzero mass; the slack vs
    * the textbook normalization is irrelevant for a ranking filter and
    * keeps every probability a ratio of integers plus D.) */
  final case class KnModel(vocab: Seq[String], bigrams: DataFrame,
      contexts: DataFrame, rights: DataFrame, distinctBigrams: Long,
      discount: Double) {
    def vocabSize: Int = vocab.size
  }

  /** Fit the interpolated-KN bigram model on a bounded reference slice
    * (same scale shape as [[fit]]: driver vocab, broadcast count
    * frames; the three count frames and T all derive from one bigram
    * aggregate). */
  def fitKn(ref: DataFrame, textCol: String, vocabSize: Int = 512,
      discount: Double = 0.75): KnModel = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val base = fit(ref, textCol, vocabSize)
    val contexts = base.bigrams.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1c"))
    val rights = base.bigrams.groupBy("w2").agg(count(lit(1)).as("n1r"))
    KnModel(base.vocab, base.bigrams,
      graft.core.CacheScope.retain(contexts),
      graft.core.CacheScope.retain(rights),
      base.bigrams.count(), discount)
  }

  /** [[score]] under the KN model — same output contract
    * (idCol, n_bigrams, entropy_bits), same exact-decimal summation and
    * 4-decimal canonicalization; the per-pair probability is three
    * broadcast joins and fixed-order IEEE arithmetic (term order matches
    * the oracle SQL token-for-token, so scores are bit-identical). */
  def scoreKn(docs: DataFrame, textCol: String, idCol: String,
      model: KnModel): DataFrame = {
    val pairs = docs
      .select(col(idCol),
        bigramPairs(mappedTokens(col(textCol), model.vocab)).as("pairs"))
      .where(graft.functions.TextFunctions.evalHere(size(col("pairs")) >= 1))
      .select(col(idCol), explode(col("pairs")).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val d = model.discount
    // T + V + 1 collapses to one long literal (same integer the oracle
    // computes from its own CTEs before casting)
    val tv1 = lit(model.distinctBigrams + model.vocabSize.toLong + 1L)
      .cast("double")
    val pcont = (coalesce(col("n1r"), lit(0L)) + lit(1L)).cast("double") / tv1
    val c1d = col("c1").cast("double")
    val p = when(coalesce(col("c1"), lit(0L)) > 0,
      greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(d), lit(0.0)) / c1d
        + lit(d) * col("n1c").cast("double") / c1d * pcont)
      .otherwise(pcont)
    val scored = pairs
      .join(broadcast(model.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(model.contexts), Seq("w1"), "left")
      .join(broadcast(model.rights), Seq("w2"), "left")
      .withColumn("logp", log2(p))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.Tables.dsum(-col("logp"), 12).as("hsum"))
      .select(col(idCol), col("n_bigrams"),
        (floor(col("hsum") / col("n_bigrams") * 1e4 + 0.5) / 1e4)
          .as("entropy_bits"))
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    * §4.3): within each group (CCNet buckets per language), rank
    * documents by LM cross-entropy ascending — best-looking first — and
    * cut at cumulative fractions of the group size. `head` = ranks with
    * r·headDen ≤ n·headNum, `middle` = the rest with r·midDen ≤ n·midNum
    * (CUMULATIVE — the default 1/3, 2/3 gives equal thirds), `tail` =
    * everything beyond. The cuts are integer cross-multiplications and
    * the rank's tie order is (entropy_bits, id) — a total order — so
    * bucket membership is byte-replayable in any engine from the same
    * scores. Docs [[score]] drops (fewer than 2 tokens: no transitions
    * to score) are absent here too; gate them upstream by length.
    *
    * Scale shape: scoring is the [[score]] broadcast chain; the rank is
    * a GROUPED two-phase prefix rank (range partition by (group, score,
    * id) → per-partition windows + broadcast per-(slice, group) offsets
    * — the [[graft.operators.Sampling.tokenBudgetPerGroup]] discipline),
    * so no group ever sorts in one task; group sizes ride the same
    * one-row-per-(partition, group) aggregate. Output stays narrow —
    * text never shuffles. */
  def perplexityBuckets(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, model: LmModel,
      headNum: Int = 1, headDen: Int = 3,
      midNum: Int = 2, midDen: Int = 3,
      numPartitions: Int = 0): DataFrame = {
    validateCuts(headNum, headDen, midNum, midDen)
    val scored = score(docs, textCol, idCol, model)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
    bucketScored(scored, idCol, groupCol,
      headNum, headDen, midNum, midDen, numPartitions)
  }

  /** [[perplexityBuckets]] under the interpolated-KN model — the CCNet
    * bucketing driven by the smoothing CCNet actually uses: [[scoreKn]]
    * replaces [[score]], the grouped two-phase prefix rank and the
    * cumulative integer cuts are shared unchanged. */
  def perplexityBucketsKn(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, model: KnModel,
      headNum: Int = 1, headDen: Int = 3,
      midNum: Int = 2, midDen: Int = 3,
      numPartitions: Int = 0): DataFrame = {
    validateCuts(headNum, headDen, midNum, midDen)
    val scored = scoreKn(docs, textCol, idCol, model)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
    bucketScored(scored, idCol, groupCol,
      headNum, headDen, midNum, midDen, numPartitions)
  }

  /** [[perplexityBuckets]] with PER-GROUP models — the full CCNet
    * recipe: each language is scored under ITS OWN reference LM (a
    * French page's fluency is meaningless under an English model), then
    * ranked and cut within its group as before. Groups without a model
    * are DROPPED (they cannot be scored — the [[graft.operators.Sampling.mixtureSelect]]
    * "a mix is a contract" rule); modeled groups absent from the data
    * fail loud. With every group mapped to the SAME model this is
    * exactly [[perplexityBuckets]] (spec-pinned). Scoring stays the
    * per-model broadcast chain — one pass per model over that group's
    * slice; the rank is the same grouped two-phase prefix rank over the
    * union. */
  def perplexityBucketsBy(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, models: Map[String, LmModel],
      headNum: Int = 1, headDen: Int = 3,
      midNum: Int = 2, midDen: Int = 3,
      numPartitions: Int = 0): DataFrame = {
    require(models.nonEmpty, "perplexityBucketsBy: need at least one model")
    validateCuts(headNum, headDen, midNum, midDen)
    val input = graft.core.CacheScope.retainInput(docs)
    val present = input.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val missing = models.keySet.diff(present)
    require(missing.isEmpty,
      s"perplexityBucketsBy: modeled groups absent from the data: " +
        s"${missing.toSeq.sorted.mkString(", ")}")
    val scored = models.toSeq.sortBy(_._1).map { case (g, m) =>
      score(input.where(col(groupCol).cast("string") === g), textCol, idCol, m)
        .withColumn(groupCol, lit(g))
    }.reduce(_ unionByName _)
    bucketScored(scored, idCol, groupCol,
      headNum, headDen, midNum, midDen, numPartitions)
  }

  /** [[perplexityBucketsBy]] with PER-GROUP interpolated-KN models —
    * the full CCNet recipe under the smoothing it actually uses. Same
    * group contracts as [[perplexityBucketsBy]] (unmodeled groups
    * dropped, modeled-but-absent groups loud); with every group mapped
    * to the SAME model this is exactly [[perplexityBucketsKn]]
    * (spec-pinned). */
  def perplexityBucketsByKn(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, models: Map[String, KnModel],
      headNum: Int = 1, headDen: Int = 3,
      midNum: Int = 2, midDen: Int = 3,
      numPartitions: Int = 0): DataFrame = {
    require(models.nonEmpty, "perplexityBucketsByKn: need at least one model")
    validateCuts(headNum, headDen, midNum, midDen)
    val input = graft.core.CacheScope.retainInput(docs)
    val present = input.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val missing = models.keySet.diff(present)
    require(missing.isEmpty,
      s"perplexityBucketsByKn: modeled groups absent from the data: " +
        s"${missing.toSeq.sorted.mkString(", ")}")
    val scored = models.toSeq.sortBy(_._1).map { case (g, m) =>
      scoreKn(input.where(col(groupCol).cast("string") === g), textCol, idCol, m)
        .withColumn(groupCol, lit(g))
    }.reduce(_ unionByName _)
    bucketScored(scored, idCol, groupCol,
      headNum, headDen, midNum, midDen, numPartitions)
  }

  private def validateCuts(headNum: Int, headDen: Int,
      midNum: Int, midDen: Int): Unit = {
    require(headDen > 0 && midDen > 0 && headNum >= 0 && midNum >= 0,
      "perplexityBuckets: fractions must be non-negative with positive denominators")
    require(headNum * midDen <= midNum * headDen,
      s"perplexityBuckets: cuts must be cumulative (head ≤ mid), " +
        s"got $headNum/$headDen > $midNum/$midDen")
    require(midNum <= midDen,
      s"perplexityBuckets: mid cut must be ≤ 1, got $midNum/$midDen")
  }

  /** The grouped two-phase prefix rank + cumulative integer cuts over a
    * scored frame (idCol, n_bigrams, entropy_bits, groupCol). */
  private def bucketScored(scored: DataFrame, idCol: String,
      groupCol: String, headNum: Int, headDen: Int,
      midNum: Int, midDen: Int, numPartitions: Int): DataFrame = {
    val spark = scored.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = scored
      .repartitionByRange(n, col(groupCol), col("entropy_bits"), col(idCol))
      .sortWithinPartitions(col(groupCol), col("entropy_bits"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val cached = graft.core.CacheScope.retain(ranged)
    val counts = cached
      .groupBy(col("__pid"), col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    require(!counts.exists(_._2 == null),
      s"perplexityBuckets: null values in group column '$groupCol' — coalesce them first")
    val offsets: Seq[((Int, String), Long)] = counts.groupBy(_._2).toSeq
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, c) =>
          val off = acc; acc += c; (pid, g) -> off
        }
      }
    val sizes: Map[String, Long] =
      counts.groupBy(_._2).map { case (g, rows) => g -> rows.map(_._3).sum }
    val sep = "\u0001" // unit separator: cannot appear in a decimal pid
    val keyCol = concat_ws(sep, col("__pid").cast("string"),
      col(groupCol).cast("string"))
    val offCol = coalesce(
      element_at(
        map(offsets.flatMap { case ((p, g), o) =>
          Seq(lit(s"$p$sep$g"), lit(o)) }: _*),
        keyCol),
      lit(0L))
    val sizeCol = element_at(
      map(sizes.toSeq.flatMap { case (g, s) => Seq(lit(g), lit(s)) }: _*),
      col(groupCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol))
      .orderBy(col("entropy_bits"), col(idCol))
    cached
      .withColumn("ppl_rank", row_number().over(w).cast("long") + offCol)
      .withColumn("bucket",
        when(col("ppl_rank") * headDen <= sizeCol * headNum, "head")
          .when(col("ppl_rank") * midDen <= sizeCol * midNum, "middle")
          .otherwise("tail"))
      .drop("__pid")
  }
}
