package graft

import org.apache.spark.sql.SparkSession

/** Not a test — Test/runMain graft.KCenterProbe [dir]: measures the
  * exact-path kCenterSelect per-iteration cost at two k values over the
  * scaled corpus. The running-min-distance rewrite makes each iteration
  * one TakeOrdered(1) over the (id, vec, d) state + one map-side least()
  * update, so the marginal cost per added center must be flat in i — the
  * pre-rewrite form (isin exclusion list + least over ALL centers)
  * rebuilt O(i) expression per round and its marginal cost grew with i. */
object KCenterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scaled30x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(k: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Sampling.kCenterSelect(emb, "embedding", "vec_id", k)
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(2) // warm up codegen + cache
    val t8 = time(8)
    val t32 = time(32)
    val t64 = time(64)
    val perIterEarly = t8 / 8
    val perIterMid = (t32 - t8) / 24
    val perIterLate = (t64 - t32) / 32
    println(f"kcenter: k=8 $t8%.2f s, k=32 $t32%.2f s, k=64 $t64%.2f s; " +
      f"per-iteration early $perIterEarly%.3f s, mid-marginal $perIterMid%.3f s, " +
      f"late-marginal $perIterLate%.3f s (marginal cost is bounded by the " +
      f"16-iteration checkpoint window — mid ~ late proves it stops growing; " +
      f"the grown-isin form grew without bound in i)")
    spark.stop()
  }
}
