package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection for key queries: pushdown / broadcast / codegen
  * checks (not a test; Test/runMain graft.PlanProbe [query...]). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_filter_dsl", "q_annotate_join", "q_star_join", "q_sort_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString()
      // compact: keep structure lines only
      println(df.queryExecution.executedPlan.treeString.linesIterator
        .take(40).mkString("\n"))
      val formatted = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      println("PushedFilters: " + "PushedFilters: \\[[^\\]]*\\]".r
        .findAllIn(plan).mkString(" | "))
    }
    spark.stop()
  }
}
