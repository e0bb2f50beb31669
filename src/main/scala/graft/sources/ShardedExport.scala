package graft.sources

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sharded corpus export — the "last mile" of a curation
  * pipeline: lay the final mix out in the deterministic global training
  * order ([[graft.operators.Sampling.deterministicShuffle]]), deal it
  * round-robin into `nShards` shards (shard = (rank−1) mod n: exactly
  * balanced, and each data-parallel reader walking its shard in rank
  * order interleaves back into the global order), write one JSONL
  * directory per shard, and emit a MANIFEST row per shard so the
  * training side can checksum what it reads.
  *
  * Manifest columns: `shard, n_docs, n_tokens, n_bytes, content_hash` —
  * the hash is a bit-XOR of per-doc [[portableHash]] values over
  * `len(id) || ':' || id || ':' || text` (NOT text alone: pure-content
  * hashes cancel in pairs under XOR, so dropping or duplicating two
  * equal-text docs — or swapping them between shards — would leave a
  * text-only checksum unchanged; mixing the unique id in makes every
  * per-doc contribution distinct, so any such mutation flips the XOR;
  * and the LENGTH PREFIX makes the encoding unambiguous for string ids
  * containing ':' — without it, id '1' + text '2:x' and id '1:2' +
  * text 'x' encode identically and such colliding pairs could still
  * XOR-cancel). Still order-free
  * (XOR commutes, so it is partitioning-invariant), 64-bit, and
  * engine-portable (DuckDB replays it with `bit_xor` over the same
  * md5-derived hashes — gate query q_shard_manifest). A null text
  * contributes null (skipped by XOR), matching the repo's null-flows-
  * through contract: `||` and `concat` both propagate null.
  *
  * Scale shape: the rank comes from the two-phase prefix-sum shuffle
  * (no single-partition window); the manifest is one partial-aggregated
  * groupBy over `nShards` keys; the write repartitions by shard so each
  * shard directory is produced by the tasks that own its rows. Payload
  * text crosses the wire once (the shard shuffle) — at 100 TB, point
  * the writer at the curated mix and the export is one pass.
  */
object ShardedExport {

  /** Input columns + (shuffle_rank, shard). */
  def withShard(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    graft.operators.Sampling.deterministicShuffle(df, idCol, seed)
      .withColumn("shard", (col("shuffle_rank") - 1) % nShards)
  }

  /** Per-doc checksum contribution: [[portableHash]] of the prefix-free
    * `len(id) ':' id ':' text` encoding (see object doc). */
  private def docHash(idCol: String, textCol: String) =
    portableHash(concat(
      length(col(idCol).cast("string")).cast("string"), lit(":"),
      col(idCol).cast("string"), lit(":"), col(textCol)))

  /** Per-shard manifest (no filesystem dependency — composes with
    * [[write]] or with any external writer). */
  def manifest(df: DataFrame, textCol: String, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame =
    withShard(df, idCol, nShards, seed)
      .withColumn("__ph", docHash(idCol, textCol))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("n_tokens"),
        sum(length(encode(col(textCol), "UTF-8")).cast("long")).as("n_bytes"),
        expr("bit_xor(__ph)").as("content_hash"))

  /** Write one JSONL directory per shard under `dir` (shard=<k>/...)
    * and return the manifest of what was written. The manifest is
    * computed from the same lazy input plan — callers that need
    * write-then-verify semantics should re-read the shards and compare
    * against this manifest (that is its purpose). */
  def write(df: DataFrame, textCol: String, idCol: String, dir: String,
      nShards: Int, seed: Long = 42L): DataFrame = {
    val sharded = graft.core.CacheScope.retain(
      withShard(df, idCol, nShards, seed))
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_rank"))
      .write.mode("overwrite").partitionBy("shard").json(dir)
    sharded
      .withColumn("__ph", docHash(idCol, textCol))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("n_tokens"),
        sum(length(encode(col(textCol), "UTF-8")).cast("long")).as("n_bytes"),
        expr("bit_xor(__ph)").as("content_hash"))
  }
}
