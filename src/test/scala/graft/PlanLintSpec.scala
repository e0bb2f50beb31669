package graft

import graft.plans.PlanLint
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** PlanLint: the packaged scale-smell checks must flag the classic
  * traps and stay quiet on the disciplined equivalents. */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("flags cartesian products and global windows; clean plans lint clean") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    val cart = PlanLint.lint(a.crossJoin(b))
    assert(cart.exists(f => f.kind == "cartesian-product" || f.kind == "nested-loop-join"),
      cart.mkString(", "))

    val globalWin = docs.withColumn("rn",
      row_number().over(Window.orderBy("doc_id")))
    assert(PlanLint.lint(globalWin).exists(_.kind.startsWith("global-window")))

    // the disciplined equivalent (two-phase rank) lints clean
    val curriculum = graft.operators.Sampling.curriculumOrder(
      docs.where(col("text").isNotNull)
        .withColumn("__score", graft.functions.TextFunctions.tokenCount(col("text"))),
      "__score", "doc_id", nBands = 2)
    assert(PlanLint.lint(curriculum).isEmpty,
      PlanLint.lint(curriculum).mkString(", "))

    // assertClean: throws listing the finding; allow-list suppresses
    intercept[IllegalArgumentException] { PlanLint.assertClean(a.crossJoin(b)) }
    PlanLint.assertClean(a.crossJoin(b),
      allow = Set("cartesian-product", "nested-loop-join"))
  }

  test("unpruned-scan: a whole-row UDF is flagged, a pruned scan is not") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    // a UDF over struct(*) consumes every column, so the parquet scan
    // cannot prune — and the query returns one narrow column
    val rowUdf = udf((r: org.apache.spark.sql.Row) => r.length)
    val unpruned = li.select(rowUdf(struct(li.columns.map(col): _*)).as("w"))
    val findings = PlanLint.lint(unpruned)
    assert(findings.exists(_.kind == "unpruned-scan"), findings.mkString(", "))

    // the disciplined equivalent — select first — lints clean
    val pruned = li.select(col("l_quantity"), col("l_discount"))
      .where(col("l_discount") > 0.05)
    assert(PlanLint.lint(pruned).isEmpty, PlanLint.lint(pruned).mkString(", "))

    // a genuine full-width read (select *) is NOT an unpruned-scan smell
    assert(!PlanLint.lint(li).exists(_.kind == "unpruned-scan"))
  }

  test("gate queries lint clean (the PlanSpec pins as one library call)") {
    Seq("q_dedup_minhash", "q_curation_pipeline", "q_langid").foreach { q =>
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      assert(PlanLint.lint(df).isEmpty, s"$q: ${PlanLint.lint(df).mkString(", ")}")
    }
  }
}
