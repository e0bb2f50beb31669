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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val gcTaskTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        taskTime.addAndGet(si.taskMetrics.executorRunTime)
        gcTaskTime.addAndGet(si.taskMetrics.jvmGCTime)
        if (sys.env.contains("PERF_STAGES"))
          stages += ((si.stageId, si.taskMetrics.executorRunTime, si.numTasks,
            si.details.linesIterator.take(1).mkString.take(90)))
      }
    })
    def driverGcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { n =>
      stages.clear()
      // PERF_CLEAR=release: drop CacheScope-retained frames before this
      // query; PERF_CLEAR=all: also clear Spark's whole cache registry —
      // for bisecting cross-query cache interactions
      sys.env.get("PERF_CLEAR") match {
        case Some("release") => graft.core.CacheScope.releaseAll()
        case Some("all") =>
          graft.core.CacheScope.releaseAll(); spark.catalog.clearCache()
        case _ =>
      }
      val t0 = System.nanoTime()
      jobs.set(0); taskTime.set(0); gcTaskTime.set(0)
      val gc0 = driverGcMillis
      val cnt = try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}"); -1L }
      println(f"PERF $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt" +
        f"  jobs=${jobs.get}%3d taskTime=${taskTime.get / 1000.0}%7.1f s" +
        f" taskGc=${gcTaskTime.get / 1000.0}%6.1f s drvGc=${(driverGcMillis - gc0) / 1000.0}%6.1f s")
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
