package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
  * the corpus embeddings with k-means, then prune near-duplicate pairs
  * ONLY within each cluster — the clustering bounds the candidate set so
  * the quadratic pair scan runs over Σ c_i² rows instead of n², which is
  * what makes semantic dedup feasible at corpus scale. Where
  * [[Similarity.embeddingNearDupPairs]] finds near-IDENTICAL embeddings
  * (high threshold, IVF-bucketed), this targets the lower-threshold
  * "semantically redundant" regime where a global threshold join would
  * explode: redundancy only needs to be resolved within a semantic
  * neighborhood, and the cluster IS that neighborhood.
  *
  * Prune rule (pairwise, matching this repo's dedup convention — see
  * q_dedup_minhash): a row is dropped iff some SMALLER-id row in the
  * same cluster has cosine ≥ tau with it; the minimum id of every
  * similar pair always survives. Cluster labels are canonicalized to
  * the minimum member id, erasing k-means' arbitrary numbering.
  *
  * Scale shape: the fit runs on a bounded sample via the shared
  * [[Similarity.fitQuantizer]] recipe (flat cost in n); assignment is
  * one closure-captured tight-loop UDF inside the scan (no join);
  * unit-normalization happens once per ROW before the pair join (never
  * per pair); the pair scan shuffles narrow (cluster, id, unit-vec)
  * rows once on cluster id. At 100 TB the operator's knob is
  * nClusters ∝ n / targetClusterSize: it directly caps the per-cluster
  * quadratic term, and the cluster-id shuffle partitions evenly as long
  * as the quantizer stays roughly balanced (the same argument as IVF).
  *
  * The fit is fully deterministic and layout-invariant: fitQuantizer
  * samples by content hash and runs Lloyd on the driver, so the same
  * data yields the same centroids at any parallelism.
  */
object SemDedup {

  /** Converged cluster centroids for this operator's fit parameters —
    * exposed so an external verifier can embed them as literals
    * (OracleFitProbe; the q_kmeans embedded-centroids pattern). */
  def fitCentroids(emb: DataFrame, vecCol: String, nClusters: Int,
      seed: Long = 42L, maxIter: Int = 20): Array[Array[Double]] =
    Similarity.fitQuantizer(
      emb.select(col(vecCol).cast("array<double>").as("__v")),
      "__v", nClusters, seed, maxIter)

  /** Cluster + prune. Output: (idCol, cluster, keep) — one row per input
    * row; `cluster` is the min member id of the k-means cell, `keep` is
    * false iff a smaller-id same-cluster row is cosine-≥-tau similar. */
  def prune(emb: DataFrame, vecCol: String, idCol: String,
      nClusters: Int, tau: Double, seed: Long = 42L,
      maxIter: Int = 20, maxCellSize: Int = DefaultMaxCellSize): DataFrame = {
    require(nClusters > 0, "nClusters must be positive")
    val input = graft.core.CacheScope.retainInput(emb)
    pruneWith(input, vecCol, idCol,
      fitCentroids(input, vecCol, nClusters, seed, maxIter), tau, maxCellSize)
  }

  /** Default per-cell row cap for the mega-cell guard in [[pruneWith]]:
    * a cell at the cap costs ~2·10⁸ candidate pairs — heavy but
    * bounded. Healthy SemDeDup cells are orders of magnitude smaller
    * (nClusters should target ~10³-10⁴ rows/cell). */
  val DefaultMaxCellSize: Int = 20000

  /** [[prune]] against an EXISTING centroid table — the build-once /
    * serve-many form (the [[Similarity.IvfIndex]] pattern): fit the
    * quantizer on one corpus snapshot, keep pruning future increments
    * against the same semantic partition without refitting.
    *
    * Mega-cell guard: a degenerate corpus (millions of near-identical
    * embeddings) can collapse into ONE k-means cell, silently turning
    * the within-cell pair join quadratic. Cell sizes are counted first
    * (one cheap aggregation over the cached assignment); any cell over
    * `maxCellSize` is deterministically sub-split by id hash so no
    * join group exceeds the cap, and a warning names the offending
    * cells. Sub-splitting is the operator's own neighborhood
    * approximation applied one level down — pairs across sub-cells go
    * uncompared, so an oversized cell keeps ~one representative PER
    * SUB-CELL instead of one overall (graceful, bounded degradation;
    * the durable fix the warning points at is raising nClusters).
    * Cluster labels still canonicalize over the FULL cell (labeling is
    * a window, not a pair scan — it never goes quadratic). */
  def pruneWith(emb: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], tau: Double,
      maxCellSize: Int = DefaultMaxCellSize): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(maxCellSize > 0, "maxCellSize must be positive")
    val input = graft.core.CacheScope.retainInput(emb)
    // a null embedding has no semantic neighborhood: excluded from the
    // output (same contract as the ANN paths)
    val base = input.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
    val cellOf = Similarity.nearestCellsUdf(centroids, 1)
    // assignment + one-time unit normalization, cached: the frame backs
    // both sides of the pair join and the final labeling
    val unit = graft.core.CacheScope.retain(
      Similarity.withUnitVec(
        base.withColumn("__c", cellOf(col("__v"))(0)), "__v", "__u")
        .select(col(idCol), col("__c"), col("__u")))
    val oversized = unit.groupBy("__c").agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxCellSize)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val withSub =
      if (oversized.isEmpty) unit.withColumn("__cs", col("__c").cast("long"))
      else {
        System.err.println(
          s"SemDedup: ${oversized.length} cell(s) over maxCellSize=$maxCellSize " +
            s"(${oversized.map { case (c, n) => s"cell $c: $n rows" }.mkString(", ")}) — " +
            "sub-splitting by id hash; raise nClusters to restore full within-cell recall")
        val spark = unit.sparkSession
        import spark.implicits._
        val splits = oversized.map { case (c, n) =>
          (c, math.ceil(n.toDouble / maxCellSize).toInt)
        }.toSeq.toDF("__c", "__k")
        // sub-cell id packs (cell, hash-slice) into one long join key;
        // unaffected cells keep slice 0
        unit.join(broadcast(splits), Seq("__c"), "left")
          .withColumn("__cs", col("__c").cast("long") * 1000000L +
            when(col("__k").isNull, lit(0L))
              .otherwise(pmod(xxhash64(col(idCol)), col("__k").cast("long"))))
          .drop("__k")
      }
    val a = withSub.select(col("__cs"), col(idCol).as("__id_a"), col("__u").as("__ua"))
    val b = withSub.select(col("__cs"), col(idCol).as("__id_b"), col("__u").as("__ub"))
    val losers = a.join(b, Seq("__cs"))
      .where(col("__id_a") < col("__id_b"))
      .where(Similarity.dot(emb.sparkSession)(col("__ua"), col("__ub")) >= tau)
      .select(col("__id_b").as(idCol)).distinct()
      .withColumn("__lost", lit(true))
    unit
      .withColumn("cluster", min(col(idCol)).over(Window.partitionBy(col("__c"))))
      .join(losers, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        not(coalesce(col("__lost"), lit(false))).as("keep"))
  }
}
