package graft.operators

import org.apache.spark.sql.DataFrame
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
      budgetTokens: Int, streams: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(streams > 0, "streams must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val budget = budgetTokens.toLong
    // total on degenerate rows: a null text packs as 0 tokens; a null id
    // has no identity to lay out or join back on and is dropped
    val narrow = df
      .where(col(idCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        pmod(col(idCol).cast("long"), lit(streams.toLong)).as("stream"),
        coalesce(graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long"),
          lit(0L)).as("ntok"))
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
}
