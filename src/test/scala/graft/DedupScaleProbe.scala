package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: minhash pair counts + verified-Jaccard distribution at
  * sf0.1 and on a 2-replica subset of the scaled corpus (not a test). */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    Seq(0.8, 0.5).foreach { th =>
      val p0 = graft.operators.Dedup.minHashLshPairs(base, "text", "doc_id",
        jaccardThreshold = th)
      println(s"sf0.1 th=$th pairs=" + p0.count())
    }

    val scaled = spark.read.parquet("target/scaled10x/documents.parquet")
      .where(col("doc_id") < 10000000L * 2) // replicas 0 and 1 only
    println("subset docs=" + scaled.count())
    val p1 = graft.operators.Dedup.minHashLshPairs(scaled, "text", "doc_id",
      jaccardThreshold = 0.5)
    val withRep = p1
      .withColumn("rep_a", (col("id_a") / 10000000L).cast("int"))
      .withColumn("rep_b", (col("id_b") / 10000000L).cast("int"))
    withRep.groupBy(col("rep_a") === col("rep_b")).agg(
      count(lit(1)).as("pairs"), min("jaccard"), avg("jaccard")).show(false)
    spark.stop()
  }
}
