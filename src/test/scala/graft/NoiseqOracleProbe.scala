package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the NOISeq normalization internals at sf0.01 for oracle
  * debugging (not a test). */
object NoiseqOracleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val aggs = for (rf <- Seq("A", "N", "R"); rep <- 0 to 2) yield
      sum(when(col("l_returnflag") === rf && pmod(col("l_linenumber"), lit(3)) === rep, 1)
        .otherwise(0)).cast("double").as(s"${rf.toLowerCase}_$rep")
    val rm = li.groupBy(col("l_partkey")).agg(aggs.head, aggs.tail: _*)
    val dataCols = Seq("a_0", "a_1", "a_2", "r_0", "r_1", "r_2")
    val zeroed = rm.select(
      (col("l_partkey") +: dataCols.map(c =>
        when(col(c).cast("double") === 0.0, lit(0.5))
          .otherwise(col(c).cast("double")).as(c))): _*).cache()
    val lib = graft.functions.Normalization.libSizes(zeroed, dataCols)
    println("LIB " + dataCols.map(c => f"$c=${lib(c)}").mkString(" "))
    val meanLib = dataCols.map(lib).sum / dataCols.size
    println(f"MEANLIB $meanLib")
    val raw = dataCols.map { c =>
      c -> graft.stats.Tmm2.pairFactor(zeroed, c, dataCols.head, lib(c), lib(dataCols.head))
    }.toMap
    println("RAWF " + dataCols.map(c => f"$c=${raw(c)}%.10f").mkString(" "))
    val gm = math.exp(raw.values.map(math.log).sum / raw.size)
    val scales = dataCols.map(c => c -> meanLib / (lib(c) * raw(c) / gm)).toMap
    println("SCALE " + dataCols.map(c => f"$c=${scales(c)}%.10f").mkString(" "))
    spark.stop()
  }
}
