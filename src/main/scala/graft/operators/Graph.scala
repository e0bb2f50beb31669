package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl/domain quality ranking — the PageRank
  * family a web-scale curation pipeline uses to prioritize crawl
  * frontiers and weight domains (Page et al. 1999; Common Crawl
  * publishes exactly this artifact for its URL index).
  *
  * Determinism contract: the whole recurrence runs in SCALED INTEGER
  * arithmetic (BIGINT micro-units, `scale` units = rank mass 1.0).
  * Per-edge contributions use floor division, per-iteration damping is
  * an integer multiply-then-floor-divide, and all sums are exact
  * 64-bit integer sums — order-free, so a DuckDB replay of the same
  * recurrence matches bit-for-bit with zero float trust. The price is
  * a deterministic quantization loss of < outdeg micro-units per node
  * per iteration (mass leaks DOWNWARD only — floor never rounds up),
  * irrelevant at scale 1e12 and identical in both engines.
  *
  * Scale shape (100 TB link graph): the edge list is shuffled ONCE
  * into a `src`-keyed layout and persisted; each iteration is then one
  * shuffle of the (node, rank) frame to the edge partitioning plus one
  * map-side-combined `groupBy(dst)` — the textbook Pregel cost, no
  * growing state. The dangling-mass term is a driver-side scalar
  * aggregate riding the plan as a broadcast 1-row frame (the Pregel
  * "global aggregator" — in-plan so no iteration-varying literal
  * defeats codegen reuse). Every iteration ends in an eager
  * `localCheckpoint`, so the next round reads a flat LogicalRDD: plan
  * size and Catalyst analysis cost stay CONSTANT in the iteration
  * count (the rank frame appears twice per round — dangling aggregate
  * + contribution join — so an un-flattened plan would double every
  * iteration).
  */
object Graph {

  /** Default rank mass denomination: 1.0 == 1e12 micro-units. */
  val DefaultScale = 1000000000000L

  /** Power-iteration PageRank on an explicit node + edge list.
    *
    * @param nodes      one row per node (extra columns ignored)
    * @param edges      directed edge list; self-loops and duplicate
    *                   edges are dropped (simple-graph semantics)
    * @param teleport   optional personalization set: the random surfer
    *                   restarts uniformly over THIS set (and dangling
    *                   mass re-enters through it). None = classic
    *                   PageRank (restart over all nodes).
    * @param iterations fixed power-iteration count (deterministic
    *                   output — no float convergence test)
    * @param dampNum/dampDen damping factor as an exact rational
    *                   (default 85/100)
    * @return (node BIGINT, rank_micro BIGINT) — rank in `scale` units,
    *         one row per node, total mass ≤ `scale` (floor loss only)
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, nodeCol: String,
      srcCol: String, dstCol: String, iterations: Int,
      teleport: Option[DataFrame] = None, dampNum: Int = 85,
      dampDen: Int = 100, scale: Long = DefaultScale): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "pageRank: need 0 < damp < 1")
    val spark = nodes.sparkSession
    import spark.implicits._

    val nd = nodes.select(col(nodeCol).cast("long").as("node")).distinct()
    // scale-adaptive iteration parallelism: the per-iteration frames are
    // (node, rank) and (src, dst) longs, so ~2M rows ≈ 64 MB per task —
    // the guide's 100 MB–1 GB shuffle-partition band. Sizing from the
    // INPUT row counts (one narrow count job each, amortized over every
    // iteration) instead of the session shuffle-partition conf means a
    // 15k-node gate graph runs 1-partition iterations (32 near-empty
    // tasks per stage × ~4 stages × iterations was pure scheduler
    // overhead) while a 100 TB link graph still fans out to the conf
    // ceiling the cluster operator tuned.
    val confP = spark.sessionState.conf.numShufflePartitions
    val approxRows = math.max(edges.count(), nodes.count())
    val nP = math.max(1L, math.min(confP.toLong,
      (approxRows + 2000000L - 1L) / 2000000L)).toInt
    // one-time edge shuffle into the src-keyed layout every iteration
    // joins against (distinct() alone leaves hash(src, dst) partitioning
    // — the contribution join would re-exchange the EDGE side every
    // iteration); distinct() also dedups (simple graph)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(nP, col("src"))
      .persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))

    val tel = teleport.map(_.select(col(nodeCol).cast("long").as("node")).distinct())
    // static per-node frame: (node, outdeg, t) with t = 1 iff in the
    // teleport set — joined once, reused every iteration; persisted in
    // the node-keyed layout so the per-iteration combine join never
    // re-exchanges it
    val withDeg = nd.join(outdeg, nd("node") === outdeg("src"), "left")
      .select(nd("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
    val base = tel match {
      case Some(t) =>
        withDeg.join(t.withColumn("__t", lit(1L)), Seq("node"), "left")
          .select(col("node"), col("outdeg"), coalesce(col("__t"), lit(0L)).as("t"))
      case None => withDeg.withColumn("t", lit(1L))
    }
    val baseFrame = base.repartition(nP, col("node")).persist()
    val tCount = baseFrame.where(col("t") === 1L).count()
    require(tCount > 0, "pageRank: empty teleport set")

    // r0: uniform over the teleport set (floor division — exact replay)
    val r0 = scale / tCount
    // (1-d)/t restart mass per teleport node, exact integer
    val baseTerm = ((dampDen - dampNum).toLong * scale) / (dampDen.toLong * tCount)

    var ranks = baseFrame
      .withColumn("r", when(col("t") === 1L, lit(r0)).otherwise(lit(0L)))
      .localCheckpoint(true)
    var iter = 0
    while (iter < iterations) {
      iter += 1
      // Pregel global aggregator, kept INSIDE the plan: the dangling
      // mass rides as a broadcast 1-row frame instead of a collected
      // scalar, so no iteration-varying literal is baked into the plan
      // and whole-stage codegen classes are REUSED across iterations
      // (a collected share constant-folds into fresh source each round
      // and recompiles every stage). The price: `ranks` now appears
      // TWICE in each iteration's Catalyst tree (share + contribs), so
      // without flattening the plan would double every round — 2^n
      // nodes by iteration n, and AQE's explain-string pass alone
      // measured MINUTES at n = 8. Hence the eager localCheckpoint
      // EVERY iteration: the next round reads a flat LogicalRDD, plan
      // size and analysis cost stay constant in the iteration count,
      // and the checkpoint job doubles as the per-iteration
      // materialization barrier (building the recurrence fully lazily
      // instead lets the nested broadcast subtrees race to recompute
      // uncached ancestors).
      val share = ranks.where(col("outdeg") === 0L)
        .agg(coalesce(sum(col("r")), lit(0L)).as("__dang"))
        .select(expr(s"__dang div ${tCount}L").as("__share"))
      val contribs = ranks.where(col("outdeg") > 0L)
        .join(e, col("node") === col("src"))
        .select(col("dst"), expr("r div outdeg").as("c"))
      val sums = contribs.groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = baseFrame.join(sums, baseFrame("node") === sums("dst"), "left")
        .crossJoin(broadcast(share))
        .select(col("node"), col("outdeg"), col("t"),
          (lit(baseTerm) * col("t") +
            expr(s"($dampNum * (coalesce(s, 0L) + __share * t)) div $dampDen"))
            .as("r"))
        .localCheckpoint(true)
    }
    // ranks is already a flat checkpointed frame — every upstream
    // cache can be dropped NOW: a long session running many rankings
    // must not accumulate pinned frames (checkpoint blocks themselves
    // are released by the ContextCleaner once the frame is GC'd)
    e.unpersist(false)
    baseFrame.unpersist(false)
    ranks.select(col("node"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node"))
  }

  /** In/out degree profile of an edge list (after self-loop/duplicate
    * removal — the same simple-graph view [[pageRank]] ranks):
    * (node, out_deg, in_deg), one row per node appearing in `nodes`.
    * One shuffle per direction, both map-side combined. */
  def degreeProfile(nodes: DataFrame, edges: DataFrame, nodeCol: String,
      srcCol: String, dstCol: String): DataFrame = {
    val nd = nodes.select(col(nodeCol).cast("long").as("node")).distinct()
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val od = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val id = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    nd.join(od, Seq("node"), "left").join(id, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .orderBy("node")
  }
}
