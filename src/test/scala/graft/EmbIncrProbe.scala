package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall measurement for IvfIndex.nearDupAgainst at the 30×
  * probe corpus (the embeddingNearDupPairs discipline: the FULL-oracle
  * claim rests on the nprobe cell cover recalling every qualifying
  * pair; this prints index-path vs exact-cross pair counts). Not a
  * test. */
object EmbIncrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scaled30x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") % 7 =!= 0)
    val probe = e.filter(col("vec_id") % 7 === 0)
    println(s"corpus=${corpus.count()} probe=${probe.count()}")
    val t0 = System.nanoTime()
    val idx = graft.operators.Similarity.IvfIndex.build(corpus, "embedding",
      "vec_id", nlist = 16)
    val got = idx.nearDupAgainst(probe, "embedding", "vec_id", 0.45, nprobe = 12)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t1 = System.nanoTime()
    // exact cross-filter via the brute broadcast-block kernel shape:
    // cosine on unit vecs as a plain join expression (30x: 1.35e9 pairs
    // — acceptable once, this is a measurement)
    val u = graft.operators.Similarity.withUnitVec(e, "embedding", "__u")
      .select(col("vec_id"), col("__u"))
    graft.plans.GraftExtensions.register(spark)
    val exact = u.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("probe_id"), col("__u").as("__p"))
      .crossJoin(u.filter(col("vec_id") % 7 =!= 0)
        .select(col("vec_id").as("corpus_id"), col("__u").as("__c")))
      .where(graft.plans.GraftExtensions.dotArr(col("__p"), col("__c")) >= 0.45)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t2 = System.nanoTime()
    println(f"index pairs=${got.size} (${(t1 - t0) / 1e9}%.1f s)  " +
      f"exact pairs=${exact.size} (${(t2 - t1) / 1e9}%.1f s)  " +
      s"missed=${(exact -- got).size}  spurious=${(got -- exact).size}")
    spark.stop()
  }
}
