package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: lay curated documents
  * into fixed-token-budget training sequences ("packs") — the step
  * between curation and tokenization in a pretraining pipeline, where
  * examples are concatenated to the model's context length to avoid
  * padding waste.
  *
  * Semantics (deterministic and engine-reproducible, so an external SQL
  * engine can replay the exact layout): documents are dealt into
  * `streams` independent streams by `id mod streams`; each stream packs
  * greedily in ascending id order — a document is placed at the current
  * pack's running token offset unless that would overflow
  * `budgetTokens`, in which case it opens the stream's next pack at
  * offset 0. A document longer than the whole budget is still placed
  * (alone, at offset 0) — truncation policy belongs to the tokenizer,
  * not the packer. Greedy-in-order is the production choice (bin
  * packing optimally is NP-hard; greedy wastes little when documents
  * are small relative to the budget and preserves corpus order within a
  * stream, which downstream shuffling relies on being deterministic).
  *
  * Scale shape: ONE hash shuffle of three narrow columns
  * (stream, id, token count) — the text itself never moves — then a
  * per-partition sequential scan (packing is inherently sequential per
  * stream; parallelism = `streams`, which a 100 TB run sets to O(total
  * cores)). Payloads join back on id downstream. Output:
  * (idCol, stream, pack, offset, n_tokens); pack numbering restarts per
  * stream, so (stream, pack) is the global pack key.
  */
object Packing {

  def packSequences(df: DataFrame, textCol: String, idCol: String,
      budgetTokens: Int, streams: Int = 32): DataFrame =
    packSequencesBy(df,
      graft.functions.TextFunctions.tokenCount(col(textCol)),
      idCol, budgetTokens, streams)

  /** [[packSequences]] with a CALLER-SUPPLIED token-count column — the
    * budget-denominated form: pass `Bpe.tokenCount(col, model)` and
    * sequence budgets count real subword tokens instead of whitespace
    * tokens (what a training run actually packs against; whitespace
    * counts under-fill budgets by the subword inflation factor, ~1.3×
    * on English prose). Same layout semantics and scale shape — the
    * count expression evaluates map-side before the narrow shuffle, so
    * even a UDF-backed tokenizer never moves text across the wire. */
  def packSequencesBy(df: DataFrame, nTokens: Column, idCol: String,
      budgetTokens: Int, streams: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(streams > 0, "streams must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val budget = budgetTokens.toLong
    // total on degenerate rows: a null count packs as 0 tokens; a null
    // id has no identity to lay out or join back on and is dropped
    val narrow = df
      .where(col(idCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        pmod(col(idCol).cast("long"), lit(streams.toLong)).as("stream"),
        coalesce(nTokens.cast("long"), lit(0L)).as("ntok"))
    narrow
      .repartition(col("stream"))
      .sortWithinPartitions("stream", "id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several streams may hash into one partition; state resets at
        // each stream boundary, so the layout is independent of how
        // streams map to partitions
        var curStream = -1L
        var pack = 0L
        var off = 0L
        it.map { case (id, stream, ntok) =>
          if (stream != curStream) { curStream = stream; pack = 0L; off = 0L }
          else if (off > 0 && off + ntok > budget) { pack += 1; off = 0L }
          val placed = (id, stream, pack, off, ntok)
          off += ntok
          placed
        }
      }
      .toDF(idCol, "stream", "pack", "offset", "n_tokens")
  }

  /** Packing-efficiency audit — the capacity-planning rollup over a
    * [[packSequences]] layout: per stream, how many packs were opened,
    * how many tokens they carry, and the utilization
    * `n_tokens / (n_packs × budget)` (the padding-waste complement a
    * training run pays for). Utilization can exceed 1 only through
    * oversize documents (longer than the whole budget, placed alone);
    * the 4-decimal floor canonicalization keeps the k/N rational
    * engine-portable. Streams that received no documents emit no row.
    * One extra `streams`-key aggregate over the layout's narrow
    * output — nothing beyond [[packSequences]]'s own cost. */
  def packingStats(df: DataFrame, textCol: String, idCol: String,
      budgetTokens: Int, streams: Int = 32): DataFrame =
    packSequences(df, textCol, idCol, budgetTokens, streams)
      .groupBy("stream")
      .agg((max(col("pack")) + 1).as("n_packs"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("utilization",
        floor(col("n_tokens") / (col("n_packs") * budgetTokens) * 1e4 + 0.5) / 1e4)

  /** Context-window chunking — the complement of [[packSequences]] for
    * documents LONGER than the model context: split each document's
    * canonical token stream ([[graft.functions.TextFunctions.tokens]] of
    * the normalized text, the same stream every other text operator
    * counts) into windows of at most `maxTokens` tokens, consecutive
    * windows sharing `overlap` tokens so no span of context is lost at a
    * boundary.
    *
    * Window k (0-based) starts at token 1 + k·stride (stride =
    * maxTokens − overlap) and takes min(maxTokens, remaining) tokens;
    * windows are emitted while the start is in range, so the final
    * window may overlap its predecessor by more than `overlap` but never
    * duplicates a whole window. Documents with no tokens produce no
    * chunks; a doc with ≤ maxTokens tokens is one whole-doc chunk.
    *
    * Purely map-side (sequence → transform → explode): no shuffle, no
    * state, trivially linear at any scale. Output:
    * (idCol, chunk_ix, n_tokens, chunk_text). */
  def chunkWindows(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = (maxTokens - overlap).toLong
    val toks = graft.functions.TextFunctions.tokens(
      graft.functions.TextFunctions.normalizeText(col(textCol)))
    val n = size(toks).cast("long")
    // ceil((n - max)/stride) via double floor — token counts are far
    // below 2^53, so the double round-trip is exact
    val nChunks = when(n <= maxTokens, lit(1L)).otherwise(
      lit(1L) + floor((n - maxTokens + stride - 1).cast("double") / stride)
        .cast("long"))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__k"))
      .where(col("__n") >= 1)
      .select(col(idCol), explode(transform(
        sequence(lit(0L), col("__k") - 1),
        k => struct(
          k.as("chunk_ix"),
          least(lit(maxTokens.toLong), col("__n") - k * stride).as("n_tokens"),
          array_join(slice(col("__toks"), (k * stride + 1).cast("int"),
            least(lit(maxTokens.toLong), col("__n") - k * stride).cast("int")),
            " ").as("chunk_text")))).as("c"))
      .select(col(idCol), col("c.chunk_ix"), col("c.n_tokens"),
        col("c.chunk_text"))
  }
}
