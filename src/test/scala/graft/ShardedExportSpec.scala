package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class ShardedExportSpec extends SparkSpec {

  test("write + manifest: balanced round-robin shards; re-read matches the manifest") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id", "text")
    val total = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("shardexp").toString
    val manifest = graft.sources.ShardedExport
      .write(docs, "text", "doc_id", dir, nShards = 4)
      .collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_bytes"), r.getAs[Long]("content_hash")))
      .toMap
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    assert(manifest.values.map(_._1).sum == total)
    // round-robin deal is exactly balanced
    val sizes = manifest.values.map(_._1)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $manifest")
    // what landed on disk checksums back to the manifest, shard by shard
    val re = spark.read.json(dir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("n_tokens"),
        sum(length(encode(col("text"), "UTF-8")).cast("long")).as("n_bytes"),
        expr("bit_xor(cast(conv(substring(md5(concat(cast(length(cast(doc_id as string)) as string), ':', cast(doc_id as string), ':', text)), 1, 15), 16, 10) as bigint))").as("content_hash"))
      .collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_bytes"), r.getAs[Long]("content_hash")))
      .toMap
    assert(re == manifest)
  }

  test("checksum detects losing an equal-text pair (id mixed into the per-doc hash)") {
    import spark.implicits._
    // two identical-text docs: a pure-content XOR would cancel them, so
    // dropping the pair would leave a text-only checksum unchanged
    val full = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val pairDropped = full.where(col("doc_id") === 3)
    def ck(df: org.apache.spark.sql.DataFrame): Long =
      graft.sources.ShardedExport.manifest(df, "text", "doc_id", nShards = 1)
        .collect().head.getAs[Long]("content_hash")
    assert(ck(full) != ck(pairDropped))
  }

  test("checksum encoding is prefix-free for string ids containing ':'") {
    import spark.implicits._
    // 'id 1, text 2:x' vs 'id 1:2, text x' concatenate identically
    // without the length prefix — the XOR of such a colliding pair
    // cancels, so swapping both docs for different ones with the same
    // ambiguous encoding would go undetected
    def ck(rows: Seq[(String, String)]): Long =
      graft.sources.ShardedExport.manifest(
        rows.toDF("doc_id", "text"), "text", "doc_id", nShards = 1)
        .collect().head.getAs[Long]("content_hash")
    assert(ck(Seq(("1", "2:x"))) != ck(Seq(("1:2", "x"))))
  }

  test("manifest is partitioning-invariant (XOR checksum commutes)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      graft.sources.ShardedExport.manifest(df, "text", "doc_id", nShards = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(m(docs.repartition(11)) == m(docs.coalesce(1)))
  }
}
