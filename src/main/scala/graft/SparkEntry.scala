package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Filter
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is demonstrated by a
  * `queries` entry over the harness test tables; where the semantics are
  * ANSI-SQL-expressible, `oracleSql` holds the equivalent DuckDB SQL.
  * Aggregate doubles go through exact decimal summation ([[Tables.dsum]]) so
  * Spark and DuckDB produce bit-identical doubles regardless of summation
  * order; every computed column is aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1/A2-family vertical aggregation over a scan (S1/P1) ----
    "q1_agg" -> ((s, dir) => {
      val li = lineitem(s, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) - dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- F1 filter DSL: thresholds + k-of-n quantifier + isin (F1a-F1e) ----
    "q_filter_dsl" -> ((s, dir) => {
      val f = Filter(
        ("l_quantity", ">", 30),
        (Seq("l_discount", "l_tax"), "2>=", 0.02),
        ("l_returnflag", "in", Seq("A", "R")))
      f(lineitem(s, dir))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- F2 filter algebra: (f1 | f2) & f3 (filter.py:141-162) ----
    "q_filter_algebra" -> ((s, dir) => {
      val f = (Filter(("l_quantity", ">=", 49.0)) | Filter(("l_discount", "|>", 0.09))) &
        Filter(("l_returnflag", "in", Seq("N")))
      f(lineitem(s, dir))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) - CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_dsl" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 30
        |  AND ((CASE WHEN l_discount >= 0.02 THEN 1 ELSE 0 END
        |      + CASE WHEN l_tax >= 0.02 THEN 1 ELSE 0 END) >= 2)
        |  AND l_returnflag IN ('A','R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_algebra" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE ((l_quantity >= 49.0) OR (ABS(l_discount) > 0.09))
        |  AND l_returnflag IN ('N')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
