package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extracts the data-dependent fitted constants that the q_vst /
  * q_kmeans / q_agglo_single oracle SQL embeds as literals at the
  * sf0.01 correctness gate (the q_batch_effect embedded-coefficients
  * pattern; not a test). Re-run after any fixture regeneration and
  * refresh the literals in SparkEntry. */
object OracleFitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_partkey"))
      .agg(
        sum(when(col("l_returnflag") === "A", 1).otherwise(0)).cast("double").as("rf_a"),
        sum(when(col("l_returnflag") === "N", 1).otherwise(0)).cast("double").as("rf_n"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("double").as("rf_r"))

    // ---- VST: trend coefficients + size factors (sf recomputed in SQL,
    //      printed here only as a cross-check) ----
    val vst = graft.stats.Vst(index = "l_partkey")
    vst(m).count()
    val (ad, ep) = vst.lastTrend.get
    println(f"VST ad=$ad%.17g ep=$ep%.17g")
    val sf = graft.stats.DESeq2Unpaired.sizeFactors(m, Seq("rf_a", "rf_n", "rf_r"))
    println(f"VST sf=${sf.mkString(", ")}")

    // ---- KMeans: converged centroids (same pinned layout as q_kmeans —
    //      kmeans|| init samples per partition, so centroids are only
    //      deterministic per physical layout) ----
    val mPinned = m.repartition(8, col("l_partkey")).sortWithinPartitions("l_partkey")
    val km = graft.operators.KMeansOp(nClusters = 4, sort = false,
      protect = Seq("l_partkey"))
    km(mPinned).count()
    km.lastModel.get.clusterCenters.zipWithIndex.foreach { case (c, i) =>
      println(f"KMEANS c$i=${c.toArray.map(v => f"$v%.17g").mkString(", ")}")
    }

    // disagreements between the model's own assignment and exact argmin
    // over its centroids (near-tie diagnosis)
    locally {
      val centers = km.lastModel.get.clusterCenters.map(_.toArray)
      val labeled = km.lastModel.get.transform(
        new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(Array("rf_a", "rf_n", "rf_r")).setOutputCol("__features")
          .transform(mPinned))
      val dcols = centers.zipWithIndex.map { case (c, i) =>
        ((col("rf_a") - c(0)) * (col("rf_a") - c(0)) +
          (col("rf_n") - c(1)) * (col("rf_n") - c(1)) +
          (col("rf_r") - c(2)) * (col("rf_r") - c(2))).as(s"d$i")
      }
      val exact = least(col("d0"), col("d1"), col("d2"), col("d3"))
      val am = when(col("d0") === exact, 0).otherwise(
        when(col("d1") === exact, 1).otherwise(when(col("d2") === exact, 2).otherwise(3)))
      val dis = labeled.select((col("l_partkey") +: col("KNN") +: dcols): _*)
        .withColumn("argmin", am)
        .where(col("KNN") =!= col("argmin"))
      println(s"KMEANS disagreements=${dis.count()}")
      dis.orderBy("l_partkey").limit(10).collect().foreach { r =>
        println(s"KMEANS dis: " + r.mkString(", "))
      }
    }

    // ---- single-linkage 200-row subset: merge heights around the k=3
    //      cut (heights are sqrt of integer squared lattice distances;
    //      print d^2 so the oracle can compare exactly in integers) ----
    val sub = m.orderBy("l_partkey").limit(200)
    val ag = graft.operators.AggloOp(nClusters = 3, sort = false,
      linkage = "single", protect = Seq("l_partkey"))
    ag(sub).count()
    val h = ag.lastLinkage.get.map(_(2)).sorted
    val n = h.length + 1
    // d2 multiset of the largest merges: a k-cut equals eps-graph
    // connected components only when h[n-k-1] < h[n-k] strictly — print
    // the tail so the query picks a k whose boundary sits in a gap
    val d2 = h.map(x => math.round(x * x))
    println("AGGLO top d2 (k for cut AFTER this merge): " +
      (1 to 30).map(j => s"k=${j}:${d2(n - 1 - j)}").mkString(" "))
    spark.stop()
  }
}
