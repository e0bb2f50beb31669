package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the MinHash pipeline at sf0.1 (not a test). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("docs=" + docs.count())
    println("len=" + docs.select(avg(length(col("text"))), max(length(col("text")))).collect().toSeq)
    import graft.operators.Dedup
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.taskMetrics.executorRunTime, si.numTasks,
          si.name.take(60)))
      }
    })
    time("full minHashLshPairs") {
      println("pairs=" + Dedup.minHashLshPairs(docs, "text", "doc_id",
        shingleK = 5, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.5).count())
    }
    Thread.sleep(1000)
    stages.sortBy(-_._2).take(10).foreach { case (id, rt, nt, nm) =>
      println(f"  stage $id%3d runtime=${rt / 1000.0}%8.1f s tasks=$nt $nm")
    }
    val shUdf = udf { (s: String) =>
      if (s == null) Array.empty[String]
      else if (s.length < 5) Array(s)
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + 5 <= s.length) { seen.add(s.substring(i, i + 5)); i += 1 }
        val out = new Array[String](seen.size)
        seen.toArray(out); out
      }
    }
    val sh2 = time("shingle count (udf)") {
      val s = docs.withColumn("__sh",
        shUdf(graft.functions.TextFunctions.normalizeText(col("text"))))
        .select(col("doc_id"), col("__sh")).cache()
      s.count(); s
    }
    println("shingles avg=" + sh2.select(avg(size(col("__sh")))).collect()(0))
    val sig = time("signature count") {
      val s = sh2.withColumn("__sig", Dedup.minHashSignature(col("__sh"), 64))
        .select(col("doc_id"), col("__sig")).cache()
      s.count(); s
    }
    val banded = time("banded count") {
      val b = sig.select(col("doc_id"),
        explode(array((0 until 16).map { bd =>
          struct(lit(bd).as("band"),
            xxhash64(concat_ws(",",
              slice(col("__sig"), bd * 4 + 1, 4).cast("array<string>"))).as("bucket"))
        }: _*)).as("e"))
        .select(col("doc_id"), col("e.band"), col("e.bucket")).cache()
      b.count(); b
    }
    val cands = time("candidates count") {
      val l = banded.alias("l"); val r = banded.alias("r")
      val c = l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
        .dropDuplicates("id_a", "id_b").cache()
      println("cands=" + c.count()); c
    }
    time("verify") {
      val v = cands
        .join(sh2.select(col("doc_id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
        .join(sh2.select(col("doc_id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .where(col("jaccard") >= 0.5)
      println("verified=" + v.count())
    }
    spark.stop()
  }
}
