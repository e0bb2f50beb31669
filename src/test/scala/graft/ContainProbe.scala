package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for the containment family (not a test;
  * Test/runMain graft.ContainProbe [sfDir]) — locates where the wall
  * time of containmentPairs goes at bench scale. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import scala.util.chaining._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // rebuild the gate corpus exactly as q_dedup_containment does
    val base = Tables.documents(spark, dir).where(col("text").isNotNull)
      .select("doc_id", "text")
    val toksC = tokens(normalizeText(col("text")))
    val snip = base.where(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ",
          slice(toksC, lit(1), floor((size(toksC) + lit(2)) / 3).cast("int"))).as("text"))
    val corpus = base.unionByName(snip)

    spark.range(10).count() // warm

    val tauBp = 8000
    val input = graft.core.CacheScope.retainInput(corpus)
    val sh = input
      .withColumn("__toks", tokens(normalizeText(col("text"))))
      .select(col("doc_id").as("__id"),
        explode(array_distinct(wordNgramsFromTokens(col("__toks"), 3))).as("__g"))
      .pipe(graft.core.CacheScope.retain)
    time("sh count")(println("  sh rows=" + sh.count()))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__sz"))
    val dfreq = sh.groupBy("__g").agg(count(lit(1)).as("__df"))
    time("dfreq count")(println("  grams=" + dfreq.count()))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("__df"), col("__g"))
    val prefix = sh.join(dfreq, "__g")
      .withColumn("__pos", row_number().over(w))
      .join(sizes, "__id")
      .where(col("__pos") <=
        col("__sz") - floor((lit(tauBp.toLong) * col("__sz") + lit(9999L)) / 10000) + 1)
      .select(col("__id").as("id_a"), col("__g"))
      .pipe(graft.core.CacheScope.retain)
    time("prefix count")(println("  prefix rows=" + prefix.count()))
    val cand = prefix
      .join(sh.select(col("__id").as("id_b"), col("__g")), Seq("__g"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
      .pipe(graft.core.CacheScope.retain)
    time("cand count")(println("  cand rows=" + cand.count()))
    val inter = cand
      .join(sh.select(col("__id").as("id_a"), col("__g")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__g")), Seq("id_b", "__g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    time("inter count")(println("  inter rows=" + inter.count()))
    val out = inter
      .join(sizes.select(col("__id").as("id_a"), col("__sz").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__sz").as("n_b")), Seq("id_b"))
      .where(col("n_inter") * 10000 >= lit(tauBp.toLong) * col("n_a"))
    time("final count")(println("  out rows=" + out.count()))

    time("whole operator fresh")(println("  pairs=" +
      graft.operators.Dedup.containmentPairs(corpus, "text", "doc_id", 3, 0.8).count()))
    spark.stop()
  }
}
