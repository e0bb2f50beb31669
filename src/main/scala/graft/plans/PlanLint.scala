package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan lint: the scale smells this repo's own PlanSpec pins
  * for its gate queries, packaged as a library utility so a pipeline
  * author can assert them on THEIR plans before a 1000-executor run —
  * `PlanLint.lint(df)` returns human-readable findings,
  * `PlanLint.assertClean(df)` throws on any.
  *
  * Checks (each one a measured cost-center at scale):
  *  - cartesian products and broadcast nested-loop joins (quadratic);
  *  - windows with an empty partition spec (every row through ONE task);
  *  - `coalesce(1)`-style single-partition exchanges on the write path
  *    are not visible at this layer — covered by the sinks' contracts;
  *  - parquet scans that read every column while the query selects few
  *    (missing column pruning — usually a UDF over the whole row).
  */
object PlanLint {

  final case class Finding(kind: String, detail: String) {
    override def toString: String = s"[$kind] $detail"
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan
    val out = Seq.newBuilder[Finding]
    def shortNode(p: SparkPlan): String =
      p.simpleStringWithNodeId().linesIterator.next().take(120)
    foreach(plan) {
      case p if p.getClass.getSimpleName == "CartesianProductExec" =>
        out += Finding("cartesian-product",
          "quadratic row blow-up: " + shortNode(p) +
            " — band/bucket one side or add an equi-join key")
      case p if p.getClass.getSimpleName == "BroadcastNestedLoopJoinExec" =>
        out += Finding("nested-loop-join",
          "per-pair evaluation: " + shortNode(p) +
            " — acceptable only when the broadcast side is tiny by contract")
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        out += Finding("global-window",
          "window with no partition spec moves EVERY row through one task: " +
            shortNode(w) + " — use a two-phase rank (range partition + " +
            "broadcast prefix offsets)")
      case s: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if s.partitionSpec.isEmpty =>
        out += Finding("global-window-limit",
          "unpartitioned window group limit: " + shortNode(s))
      case _ =>
    }
    // Column pruning failed: a scan materializes EVERY column of a wide
    // table and the nearest Project above it funnels them all through ONE
    // expression (a UDF over struct(*), a row-wise encoder) into a narrow
    // output. Catalyst prunes requiredSchema to the referenced columns for
    // free, so a full-width scan whose columns are only ever consumed as a
    // block means the parquet reader is paying for columns the answer never
    // needed — at 100 TB that is reading 40 columns to answer from 2.
    // Genuine full-width reads (select *, screens that test every column in
    // separate predicates) reference columns individually and stay clean.
    foreachWithAncestors(plan) { (p, ancestors) =>
      p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.requiredSchema.length >= 4 &&
              s.requiredSchema.length == s.relation.dataSchema.length =>
          val scanIds = s.output.map(_.exprId).toSet
          ancestors.collectFirst {
            case pr: org.apache.spark.sql.execution.ProjectExec => pr
          }.foreach { pr =>
            val wholeRowExpr = pr.projectList.exists { e =>
              e.references.map(_.exprId).count(scanIds.contains) >= 4
            }
            if (wholeRowExpr && pr.output.length * 2 <= s.requiredSchema.length)
              out += Finding("unpruned-scan",
                s"scan reads all ${s.requiredSchema.length} columns of " +
                  s.relation.location.rootPaths.headOption.map(_.getName)
                    .getOrElse("?") +
                  s" and a single projection expression consumes the whole " +
                  s"row into ${pr.output.length} output column(s) — a " +
                  "whole-row consumer (UDF over struct(*)?) is defeating " +
                  "column pruning; select the needed columns before the " +
                  "opaque operator")
          }
        case _ =>
      }
    }
    out.result()
  }

  /** Throw (listing every finding) when the plan carries a scale smell.
    * `allow` suppresses named kinds for plans where the smell is a
    * documented contract (e.g. a broadcast nested loop over an 8-row
    * query side). */
  def assertClean(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val findings = lint(df).filterNot(f => allow.contains(f.kind))
    require(findings.isEmpty,
      s"PlanLint: ${findings.size} scale smell(s):\n" +
        findings.mkString("\n"))
  }

  /** Like [[foreach]] but hands each node its ancestor chain (nearest
    * first), so checks can relate a scan to the operator consuming it. */
  private def foreachWithAncestors(p: SparkPlan,
      ancestors: List[SparkPlan] = Nil)(f: (SparkPlan, List[SparkPlan]) => Unit): Unit = {
    f(p, ancestors)
    val below = p :: ancestors
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        foreachWithAncestors(a.executedPlan, below)(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        foreachWithAncestors(q.plan, below)(f)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        foreachWithAncestors(m.relation.cachedPlan, below)(f)
      case _ =>
    }
    p.children.foreach(foreachWithAncestors(_, below)(f))
    p.subqueries.foreach(foreachWithAncestors(_, below)(f))
  }

  private def foreach(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    // AQE and cache nodes hide their real plans from `.children`
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        foreach(a.executedPlan)(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        foreach(q.plan)(f)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        foreach(m.relation.cachedPlan)(f)
      case _ =>
    }
    p.children.foreach(foreach(_)(f))
    p.subqueries.foreach(foreach(_)(f))
  }
}
