package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question probe (Test/runMain graft.GateProbe [sfDir]): which
  * branch does the span-scrub cache size-gate take when the scrub runs
  * INSIDE the curation-v2 chain (its input there is post-gates/
  * post-dedup, whose Catalyst size estimate may be join-inflated or
  * unknown — unknown defaults HUGE and would re-cache)? Prints the
  * optimized-plan size estimate the gate reads, per stage of the
  * q_curation_pipeline2 chain, plus the standalone-documents estimate
  * for contrast. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import graft.operators.Dedup

    val d = Tables.documents(spark, sfDir)
    def sz(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val gate = if (bytes < (8L << 20)) "SMALL -> recompute" else "BIG -> cache"
      println(f"$label%-28s sizeInBytes=$bytes%-22s [$gate]")
    }
    sz(d.select("doc_id", "text"), "documents (raw)")

    val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val curated = corpus
      .withColumn("__q", qualityScore(col("text")))
      .withColumn("__lang", langId(col("text")))
      .withColumn("__nt", tokenCount(col("text")))
      .where(col("__q") >= 0.5 && col("__lang") === "en" &&
        col("__nt").between(10, 1000))
      .drop("__q", "__lang", "__nt")
    sz(curated, "after gates")
    val afterExact = Dedup.exactDedup(curated, "text", "doc_id")
    sz(afterExact, "after exactDedup")
    val afterNear = Dedup.minHashLshDedup(afterExact, "text", "doc_id",
      shingleK = 5, bands = 16, rowsPerBand = 8, jaccardThreshold = 0.8)
    sz(afterNear.select("doc_id", "text"), "after LSH dedup (scrub input)")
    spark.stop()
  }
}
