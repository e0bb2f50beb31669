package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Not a test — Test/runMain graft.NewGateProbe [reps]: scale probe for
  * the PageRank / interval-join / profiler gate families.
  *
  * The stock ScaleProbe corpus is wrong for two of these: it never
  * replicates `customer` (the PageRank node set), and replicating
  * lineitem/part WITHOUT widening the 100k coordinate domain would grow
  * interval DENSITY reps× and the true pair count reps²× — a quadratic
  * output, not an operator cost. This probe scales each fixture the way
  * its 100 TB deployment would grow:
  *  - PageRank: n nodes 0..n-1, the gate's modular edge recipe, 8
  *    iterations — edges grow reps×, expected cost ~linear in edges
  *    (plus a fixed per-iteration job-overhead floor at small n);
  *  - intervals: counts grow reps×, the coordinate domain grows reps×
  *    (constant density — the genomic case: more reads over a bigger
  *    genome), expected pairs and cost ~linear;
  *  - profiler: lineitem-shaped rows grow reps×, one-scan agg ~linear.
  * Tables land in parquet first so scans match the gate's input shape.
  */
object NewGateProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 30
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = "target/newgate_probe"
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    def rd(name: String) = spark.read.parquet(s"$out/$name.parquet")
    def time(what: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $what%-28s $dt%8.2f s  (rows=$n)")
      dt
    }

    // base scale mirrors sf0.1: 15k customers, 150k left intervals
    // (sf0.1 lineitem/4), 20k right intervals, 600k profile rows
    val nodes1 = 15000L
    val left1 = 150000L
    val right1 = 20000L
    val prof1 = 600000L

    def graphTables(n: Long, tag: String): Unit = {
      val c = spark.range(n).select(col("id").as("c"))
      write(c, s"nodes_$tag")
      val o = c.where(pmod(col("c"), lit(13)) =!= 0)
      val e = o.select(col("c").as("src"), pmod(col("c") * 31 + 7, lit(n)).as("dst"))
        .unionByName(o.select(col("c").as("src"), pmod(col("c") * 17 + 3, lit(n)).as("dst")))
        .unionByName(o.where(pmod(col("c"), lit(10)) < 3)
          .select(col("c").as("src"), lit(0L).as("dst")))
      write(e, s"edges_$tag")
    }

    def intervalTables(nl: Long, nr: Long, domain: Long, tag: String): Unit = {
      write(spark.range(nl).select(
        col("id").as("li_id"),
        pmod(col("id") * 37 + 11, lit(domain)).as("ls"),
        (pmod(col("id") * 37 + 11, lit(domain)) + 1 +
          pmod(col("id") * 13, lit(200L))).as("le")), s"ileft_$tag")
      write(spark.range(nr).select(
        col("id").as("r_id"),
        pmod(col("id") * 53, lit(domain)).as("rs"),
        (pmod(col("id") * 53, lit(domain)) + 1 +
          pmod(col("id") * 7, lit(300L))).as("re")), s"iright_$tag")
    }

    def profTable(n: Long, tag: String): Unit =
      write(spark.range(n).select(
        col("id").as("k"),
        pmod(col("id"), lit(97)).cast("double").as("v"),
        concat(lit("tag"), pmod(col("id"), lit(1000))).as("s"),
        when(pmod(col("id"), lit(50)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("w"), pmod(col("id"), lit(7)))).as("w")), s"prof_$tag")

    println(s"building base + ${reps}x probe tables under $out ...")
    graphTables(nodes1, "1x"); graphTables(nodes1 * reps, s"${reps}x")
    intervalTables(left1, right1, 1000000L, "1x")
    intervalTables(left1 * reps, right1 * reps, 1000000L * reps, s"${reps}x")
    profTable(prof1, "1x"); profTable(prof1 * reps, s"${reps}x")

    def runAll(tag: String): Map[String, Double] = {
      println(s"-- scale $tag --")
      Map(
        "pagerank" -> time(s"pagerank($tag)") {
          graft.operators.Graph.pageRank(rd(s"nodes_$tag"), rd(s"edges_$tag"),
            "c", "src", "dst", iterations = 8).count()
        },
        "interval_join" -> time(s"interval_join($tag)") {
          graft.operators.Intervals.overlapJoin(rd(s"ileft_$tag"), rd(s"iright_$tag"),
            "ls", "le", "rs", "re", binSize = 256).count()
        },
        "profile" -> time(s"profile($tag)") {
          graft.operators.Profile.columns(rd(s"prof_$tag"),
            Seq("k", "v", "s", "w")).count()
        },
        "quality_checks" -> time(s"quality_checks($tag)") {
          graft.operators.Profile.check(rd(s"prof_$tag"), Seq(
            graft.operators.Profile.NotNull("w"),
            graft.operators.Profile.Unique("k"),
            graft.operators.Profile.InRange("v", 0, 90),
            graft.operators.Profile.Matches("s", "^tag[0-9]+$"))).count()
        },
        "interval_merge" -> time(s"interval_merge($tag)") {
          graft.operators.Intervals.mergeIntervals(
            rd(s"iright_$tag").withColumn("g", pmod(col("r_id"), lit(64L))),
            "g", "rs", "re").count()
        },
        "interval_closest" -> time(s"interval_closest($tag)") {
          graft.operators.Intervals.closest(
            rd(s"ileft_$tag").withColumn("g", pmod(col("li_id"), lit(64L))),
            rd(s"iright_$tag").withColumn("g", pmod(col("r_id"), lit(64L))),
            "g", "li_id", "ls", "le", "r_id", "rs", "re", binSize = 256).count()
        })
    }

    runAll("1x") // warm-up sweep absorbs codegen/JIT
    val b = runAll("1x")
    val s = runAll(s"${reps}x")
    println(s"== ratios at ${reps}x (linear == $reps) ==")
    b.keys.toSeq.sorted.foreach { k =>
      println(f"  $k%-16s ${s(k) / b(k)}%8.1fx")
    }
    spark.stop()
  }
}
