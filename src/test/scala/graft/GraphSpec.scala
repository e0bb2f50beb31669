package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side reference of the EXACT integer recurrence
    * (floor divisions, teleport-indicator weighting) — any divergence
    * in the distributed implementation is a hard mismatch here. */
  private def refPageRank(nodes: Seq[Long], rawEdges: Seq[(Long, Long)],
      tel: Set[Long], iters: Int,
      scale: Long = Graph.DefaultScale): Map[Long, Long] = {
    val e = rawEdges.distinct.filter(p => p._1 != p._2)
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val t = tel.size.toLong
    var r = nodes.map(nd => nd -> (if (tel(nd)) scale / t else 0L)).toMap
    val baseTerm = (15L * scale) / (100L * t)
    for (_ <- 1 to iters) {
      val dang = nodes.filter(nd => !out.contains(nd)).map(r).sum
      val share = dang / t
      val s = e.map { case (a, b) => b -> r(a) / out(a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      r = nodes.map { nd =>
        val tt = if (tel(nd)) 1L else 0L
        nd -> (baseTerm * tt + 85L * (s.getOrElse(nd, 0L) + share * tt) / 100L)
      }.toMap
    }
    r
  }

  // hand graph: 0 is a hub (everyone links in), 5 dangling, 3 links
  // nowhere relevant; includes a duplicate edge and a self-loop the
  // operator must drop
  private val handNodes = (0L to 5L).toSeq
  private val handEdges = Seq(
    (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
    (1L, 2L), (2L, 3L), (4L, 1L), (4L, 1L), // duplicate
    (3L, 3L), // self-loop
    (0L, 1L))

  private def runPr(iters: Int, tel: Option[Set[Long]] = None): Map[Long, Long] = {
    val nd = handNodes.toDF("node")
    val ed = handEdges.toDF("src", "dst")
    Graph.pageRank(nd, ed, "node", "src", "dst", iters,
        teleport = tel.map(s => s.toSeq.toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank matches the driver-side integer reference exactly") {
    val got = runPr(5)
    val want = refPageRank(handNodes, handEdges, handNodes.toSet, 5)
    assert(got == want)
  }

  test("pageRank over a long iteration run still matches (per-iteration checkpoints compose)") {
    val iters = 10
    val got = runPr(iters)
    val want = refPageRank(handNodes, handEdges, handNodes.toSet, iters)
    assert(got == want)
  }

  test("personalized pageRank matches the reference and concentrates mass on the seed side") {
    val tel = Set(0L, 1L)
    val got = runPr(6, Some(tel))
    val want = refPageRank(handNodes, handEdges, tel, 6)
    assert(got == want)
    val seedMass = tel.toSeq.map(got).sum
    val restMass = handNodes.filterNot(tel).map(got).sum
    assert(seedMass > restMass,
      s"teleporting to {0,1} must concentrate mass there ($seedMass vs $restMass)")
  }

  test("pageRank is invariant to input partitioning (src-keyed layout fix)") {
    // the operator now repartitions edges by src and the node frame by
    // node before persisting (and sizes iteration parallelism from the
    // input row counts, not the session conf) — results must not depend
    // on however the caller's frames arrive partitioned
    val want = refPageRank(handNodes, handEdges, handNodes.toSet, 5)
    val nd = handNodes.toDF("node").repartition(7, col("node"))
    val ed = handEdges.toDF("src", "dst").repartition(5, col("dst"))
    val got = Graph.pageRank(nd, ed, "node", "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("hub dominance and mass conservation within floor loss") {
    val got = runPr(8)
    // node 0 receives 4 in-links on a 6-node graph: must rank first
    assert(got.maxBy(_._2)._1 == 0L)
    val total = got.values.sum
    // floor divisions only ever LOSE mass; per iteration the loss is
    // < (#edges + #nodes + 2) micro-units — generous bound here
    assert(total <= Graph.DefaultScale)
    assert(total > Graph.DefaultScale - 8L * 100L)
  }

  test("degreeProfile counts the simple-graph view (dups/self-loops dropped)") {
    val nd = handNodes.toDF("node")
    val ed = handEdges.toDF("src", "dst")
    val got = Graph.degreeProfile(nd, ed, "node", "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // simple edges: 1->0 2->0 3->0 4->0 1->2 2->3 4->1 0->1
    assert(got == List(
      (0L, 1L, 4L),
      (1L, 2L, 2L),
      (2L, 2L, 1L),
      (3L, 1L, 1L),
      (4L, 2L, 0L),
      (5L, 0L, 0L)))
  }

  test("gate fixture invariants: dense custkeys, dangling class present, hub ranks first") {
    val dir = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long")).as[Long].collect().sorted
    assert(c.head == 0L && c.last == c.length - 1L,
      "linkGraph fixture assumes dense 0..n-1 custkeys")
    val pr = SparkEntry.queries("q_pagerank")(spark, dir).collect()
    assert(pr.length == c.length)
    assert(pr.head.getLong(0) == 0L, "hub node 0 must rank first")
    // dangling nodes exist and still receive restart + inbound mass
    assert(pr.forall(_.getLong(1) > 0L))
  }
}
