package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the IVF near-dup path (Test/runMain
  * graft.NearDupProbe [dir]): counts each stage of the candidate
  * pipeline so cell skew / candidate blow-ups are measured, not guessed. */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scaled30x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val df = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = df.count()
    println(s"PROBE rows=$n")
    val u = operators.Similarity.withUnitVec(df, "embedding", "__u")
      .select(col("vec_id"), col("__u")).cache()
    u.count()
    val nlist = math.max(16L, math.min((4.0 * math.sqrt(n.toDouble)).toLong, n / 4)).toInt
    println(s"PROBE nlist=$nlist")
    val t0 = System.nanoTime()
    val centroids = operators.Similarity.fitQuantizer(
      u, "__u", nlist, seed = 42L, maxIter = 5)
    println(f"PROBE kmeans_fit=${(System.nanoTime() - t0) / 1e9}%.1fs")
    def nearestCells(k: Int) = operators.Similarity.nearestCellsUdf(centroids, k)
    val cSide = u.select(col("vec_id").as("id_c"),
      explode(nearestCells(2)(col("__u"))).as("__cell")).cache()
    val qSide = u.select(col("vec_id").as("id_q"),
      explode(nearestCells(12)(col("__u"))).as("__cell")).cache()
    println(s"PROBE cSide=${cSide.count()} qSide=${qSide.count()}")
    val cellSizes = cSide.groupBy("__cell").count().agg(
      max("count").as("mx"), expr("percentile(count, 0.99)").as("p99"),
      avg("count").as("avg")).collect()(0)
    println(s"PROBE cellSizes max=${cellSizes.get(0)} p99=${cellSizes.get(1)} avg=${cellSizes.get(2)}")
    val raw = qSide.join(cSide, Seq("__cell")).where(col("id_q") =!= col("id_c"))
    println(s"PROBE rawCandidates=${raw.count()}")
    val dedup = raw.select(least(col("id_q"), col("id_c")).as("id_a"),
      greatest(col("id_q"), col("id_c")).as("id_b")).dropDuplicates("id_a", "id_b")
    println(s"PROBE dedupCandidates=${dedup.count()}")
    spark.stop()
  }
}
