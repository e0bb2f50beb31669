package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage wall/metric probe for one declared query — the
  * measurement tool behind the optimization round (guide §1: find WHERE
  * the time goes before touching anything). Runs the query once
  * (warm-up), then once measured, printing every stage's duration,
  * task count, shuffle read/write and the first line of its name.
  *
  * Usage: Test/runMain graft.StageProbe <query> [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.bench.skipOracleSide", "true")
    graft.plans.GraftExtensions.register(spark)

    case class St(var name: String = "", var tasks: Int = 0,
        var ms: Long = 0, var shufRead: Long = 0, var shufWrite: Long = 0,
        var input: Long = 0, var submitted: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val info = sc.stageInfo
          val st = stages.getOrElseUpdate(info.stageId, St())
          st.name = info.name.linesIterator.next()
          st.tasks = info.numTasks
          st.ms = info.completionTime.getOrElse(0L) - info.submissionTime.getOrElse(0L)
          st.submitted = info.submissionTime.getOrElse(0L)
          st.shufRead = info.taskMetrics.shuffleReadMetrics.totalBytesRead
          st.shufWrite = info.taskMetrics.shuffleWriteMetrics.bytesWritten
          st.input = info.taskMetrics.inputMetrics.bytesRead
        }
    })

    // warm-up run (JIT, codegen, file listing)
    SparkEntry.queries(name)(spark, sfDir).count()
    graft.core.CacheScope.releaseAll()
    spark.sharedState.cacheManager.clearCache()

    collecting = true
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // let the listener bus drain
    println(f"[stageprobe] $name rows=$n wall=$wall%.2f s, ${stages.size} stages:")
    stages.toSeq.sortBy(_._2.submitted).foreach { case (id, s) =>
      println(f"[stageprobe]   stage $id%4d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
        f"in=${s.input / 1024}%8d KB sr=${s.shufRead / 1024}%8d KB " +
        f"sw=${s.shufWrite / 1024}%8d KB  ${s.name.take(90)}")
    }
    val sum = stages.values.map(_.ms).sum
    println(f"[stageprobe] stage-ms sum=$sum (wall covers gaps: driver/planning/broadcast)")
    spark.stop()
  }
}
