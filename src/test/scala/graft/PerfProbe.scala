package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for individual SparkEntry queries at a chosen
  * scale factor (not a test; run via Test/runMain graft.PerfProbe <sfdir>
  * <query...>). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    if (sys.env.contains("PERF_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages += ((si.stageId, si.taskMetrics.executorRunTime, si.numTasks,
            si.details.linesIterator.take(1).mkString.take(90)))
        }
      })
    names.foreach { n =>
      stages.clear()
      val t0 = System.nanoTime()
      val cnt = try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}"); -1L }
      println(f"PERF $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
      if (sys.env.contains("PERF_STAGES")) {
        Thread.sleep(500)
        stages.sortBy(-_._2).take(8).foreach { case (id, rt, nt, nm) =>
          println(f"  stage $id%3d cpu=${rt / 1000.0}%7.1f s tasks=$nt $nm")
        }
      }
    }
    spark.stop()
  }
}
