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
      .where(size(col("pairs")) >= 1)
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
}
