package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Bucketed co-located joins: writing both sides bucketed on the join key
  * must let the sort-merge join run WITHOUT a shuffle exchange — the plan
  * is the proof (SURVEY.md §4 partitioning row; the scan's output
  * partitioning satisfies the join's distribution requirement). */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  private def dropBucketTables(): Unit = Seq("li_bkt", "or_bkt").foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
  }

  test("join of two tables bucketed on the key plans without exchanges") {
    dropBucketTables()
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val or = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    Sinks.writeBucketed(li, "li_bkt", Seq("l_orderkey"), 8)
    Sinks.writeBucketed(or.withColumnRenamed("o_orderkey", "l_orderkey"),
      "or_bkt", Seq("l_orderkey"), 8)
    val expect = li.join(or, li("l_orderkey") === or("o_orderkey")).count()
    withForcedSmj {
      val joined = spark.table("li_bkt").join(spark.table("or_bkt"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle:\n$plan")
      assert(joined.count() == expect)
    }
  }

  test("aggregation on the bucket key plans without exchange") {
    withForcedSmj {
      val g = spark.table("li_bkt").groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = g.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg must not shuffle:\n$plan")
      assert(g.count() > 0)
    }
  }

  /** Disable broadcast + AQE so the plan must satisfy the join/agg
    * distribution from the bucketed scan alone. */
  private def withForcedSmj[T](f: => T): T = {
    val conf = spark.conf
    val oldB = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val oldA = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldB)
      conf.set("spark.sql.adaptive.enabled", oldA)
    }
  }
}
