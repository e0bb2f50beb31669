package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.stats.EdgeRKernel._
import graft.functions.Normalization

/** Stage-by-stage timing of the EdgeR pipeline at sf0.1 (not a test). */
object EdgeRStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val aggs = for (rf <- Seq("A", "N", "R"); rep <- 0 to 2) yield
      sum(when(col("l_returnflag") === rf && pmod(col("l_linenumber"), lit(3)) === rep, 1)
        .otherwise(0)).cast("double").as(s"${rf.toLowerCase}_$rep")
    val mat = li.groupBy(col("l_partkey")).agg(aggs.head, aggs.tail: _*)
    time("replicateMatrix count")(mat.count())
    val cols = Seq("a_0", "a_1", "a_2", "r_0", "r_1", "r_2")
    val proj = mat.select((Seq("l_partkey") ++ cols).map(col(_)): _*).cache()
    val lib = time("libSizes")(Normalization.libSizes(proj, cols))
    val factors = time("tmmFactors")(Normalization.tmmFactors(proj, cols))
    val effLib = cols.map(c => lib(c) * factors(c)).toArray
    val commonLib = math.exp(effLib.map(math.log).sum / effLib.length)
    val groupOf = Array(0, 0, 0, 1, 1, 1)
    val yArr = array(cols.map(c => coalesce(col(c).cast("double"), lit(0.0))): _*)
    val base = proj.select(col("l_partkey"), yArr.as("y"))
    val aveUdf = udf((y: Seq[Double], d: Double) => aveLogCpm(y.toArray, effLib, 2.0, d))
    val l0Udf = udf((y: Seq[Double], d: Double) =>
      l0Grid(pseudoCounts(y.toArray, groupOf, 2, effLib, commonLib, d), groupOf, 2))
    val s1 = base
      .withColumn("avelogcpm", aveUdf(col("y"), lit(0.05)))
      .withColumn("l0", l0Udf(col("y"), lit(0.01)))
      .cache()
    time("s1 kernels count")(s1.count())
    val aggRow = time("l0 sum agg")(s1.agg(
      count(lit(1)).as("n"),
      (0 until 21).map(i => sum(col("l0")(i)).as(s"s$i")): _*).collect()(0))
    val nTags = aggRow.getAs[Long]("n")
    val commonDisp = maximizeGridDisp(Array.tabulate(21)(i => aggRow.getAs[Double](s"s$i")))
    println(s"      nTags=$nTags common=$commonDisp")
    val span = if (nTags > 10) math.pow(10.0 / nTags, 0.23) else 1.0
    val width = math.max(math.min(math.floor(span * nTags).toLong, nTags), 1L)
    val half1 = math.ceil((width - 1) / 2.0).toLong
    val half2 = math.floor((width - 1) / 2.0).toLong
    println(s"      width=$width")
    val w = Window.orderBy(col("avelogcpm"), col("l_partkey")).rowsBetween(-half1, half2)
    val m0Cols = (0 until 21).map(i => avg(col("l0")(i)).over(w))
    val maxUdf = udf((ll: Seq[Double]) => maximizeGridDisp(ll.toArray))
    val s2a = s1.withColumn("m0", array(m0Cols: _*))
    time("window m0 count")(s2a.count())
    val s2 = s2a.repartition(col("l_partkey"))
      .withColumn("trend_disp", maxUdf(col("m0")))
      .withColumn("l02", l0Udf(col("y"), col("trend_disp")))
      .cache()
    time("trend + l02 count")(s2.count())
    val m0pCols = (0 until 21).map(i => avg(col("l02")(i)).over(w))
    val tagUdf = udf((l: Seq[Double], m: Seq[Double]) =>
      maximizeGridDisp(Array.tabulate(21)(i => l(i) + 0.0 * m(i))))
    val withDisp = s2.withColumn("m0p", array(m0pCols: _*))
      .repartition(col("l_partkey"))
      .withColumn("disp", tagUdf(col("l02"), col("m0p")))
      .withColumn("logcpm_out", aveUdf(col("y"), lit(commonDisp)))
    val testUdf = udf((y: Seq[Double], d: Double) => {
      val ya = y.toArray
      val pseudo = pseudoCounts(ya, groupOf, 2, effLib, commonLib, d)
      val p = exactTestDoubleTail(pseudo.take(3), pseudo.drop(3), d)
      val lfc = exactLogFc(ya, groupOf, effLib, d)
      Array(lfc, p)
    })
    val tested = withDisp.withColumn("res", testUdf(col("y"), col("disp")))
      .select(col("l_partkey"), col("res")(0).as("lfc"),
        col("logcpm_out").as("logcpm"), col("res")(1).as("p_raw")).cache()
    time("disp+test count")(tested.count())
    val out = time("bh fdr")(
      graft.functions.BhFdr.adjustDistributed(tested, "p_raw", "fdr").count())
    println(s"done rows=$out")
    spark.stop()
  }
}
