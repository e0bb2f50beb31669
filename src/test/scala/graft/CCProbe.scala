package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add((si.stageId, si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CC $tag%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val pairs = t("lsh-pairs") {
      val p = graft.operators.Dedup.minHashLshPairs(docs, "text", "doc_id").persist()
      println("pairs=" + p.count()); p
    }
    stages.clear()
    t("cc-total") {
      val c = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
      println("nodes=" + c.count()); c
    }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (id, rt, nt) =>
      println(f"  stage $id%4d cpu=${rt/1000.0}%7.2f s tasks=$nt")
    }
    println("total stages=" + stages.size)
    spark.stop()
  }
}
