package graft

import org.apache.spark.sql.functions._
import graft.operators.DbscanOp

/** DBSCAN contract (reference strategies.py legacy DBSCAN strategy —
  * sklearn semantics: -1 noise, clusters labeled in discovery order). */
class DbscanSpec extends SparkSpec {

  /** Two tight blobs + one far outlier. */
  def blobDf = {
    val blob1 = Seq((0.0, 0.0), (0.1, 0.0), (0.0, 0.1), (0.1, 0.1), (0.05, 0.05))
    val blob2 = Seq((5.0, 5.0), (5.1, 5.0), (5.0, 5.1), (5.1, 5.1), (5.05, 5.05))
    val noise = Seq((20.0, -20.0))
    val rows = (blob1 ++ blob2 ++ noise).zipWithIndex.map { case ((x, y), i) =>
      (s"p$i", x, y)
    }
    spark.createDataFrame(rows).toDF("gene_stable_id", "x", "y")
  }

  test("exact path: two blobs found, outlier is noise, labels in discovery order") {
    val out = DbscanOp(eps = 0.5, minSamples = 3)(blobDf)
      .select("gene_stable_id", "DBSCAN").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    (0 to 4).foreach(i => assert(out(s"p$i") == 0, s"p$i in first cluster"))
    (5 to 9).foreach(i => assert(out(s"p$i") == 1, s"p$i in second cluster"))
    assert(out("p10") == -1, "outlier is noise")
  }

  test("exact path: minSamples too high makes everything noise") {
    val out = DbscanOp(eps = 0.5, minSamples = 7)(blobDf)
      .select("DBSCAN").collect().map(_.getInt(0))
    assert(out.forall(_ == -1))
  }

  test("add=false drops the label column (clustering contract)") {
    val out = DbscanOp(eps = 0.5, minSamples = 3, add = false)(blobDf)
    assert(!out.columns.contains("DBSCAN"))
  }

  test("grid path agrees with exact on well-separated blobs") {
    val exact = DbscanOp(eps = 0.5, minSamples = 3)(blobDf)
      .select("gene_stable_id", "DBSCAN").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val grid = DbscanOp(eps = 0.5, minSamples = 3, maxExactRows = 0)(blobDf)
      .select("gene_stable_id", "DBSCAN").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // same partition structure: noise agrees; cluster ids may differ but
    // co-membership must match
    assert(grid("p10") == -1)
    def sameCluster(m: Map[String, Int], a: String, b: String) = m(a) == m(b) && m(a) >= 0
    for (i <- 1 to 4) assert(sameCluster(grid, "p0", s"p$i"))
    for (i <- 6 to 9) assert(sameCluster(grid, "p5", s"p$i"))
    assert(grid("p0") != grid("p5"))
    assert(exact("p0") != exact("p5"))
  }

  test("grid path scales: labels are stable and deterministic") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 2000).map { i =>
      val cx = if (i % 2 == 0) 0.0 else 10.0
      (s"g$i", cx + rng.nextGaussian() * 0.3, cx + rng.nextGaussian() * 0.3)
    }
    val df = spark.createDataFrame(rows).toDF("gene_stable_id", "x", "y")
    val a = DbscanOp(eps = 0.6, minSamples = 4, maxExactRows = 0)(df)
      .groupBy("DBSCAN").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // two dominant clusters, little noise
    val clusters = a.filter(_._1 >= 0)
    assert(clusters.size == 2, s"got $a")
    assert(clusters.values.forall(_ > 900), s"got $a")
  }
}
