package graft

import org.apache.spark.sql.functions._
import graft.operators.SemDedup

/** SemDeDup: prune rule (min id survives, pairwise within-cluster),
  * cluster canonicalization, cross-cluster blindness by construction,
  * and fit determinism per pinned layout. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight bundles far apart + two isolated points; vectors chosen so
  // k-means with k=2 must split the bundles regardless of init
  private def emb = Seq(
    (1L, Seq(10.0, 0.0, 0.0)), (2L, Seq(10.1, 0.0, 0.0)),
    (3L, Seq(9.9, 0.1, 0.0)),
    (20L, Seq(0.0, 10.0, 0.0)), (21L, Seq(0.0, 10.2, 0.0)),
    (30L, Seq(0.0, 9.0, 4.0)))
    .toDF("vec_id", "vec")
    .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))

  test("min id of every similar pair survives; similars are dropped") {
    val out = SemDedup.prune(emb, "vec", "vec_id", nClusters = 2, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // bundle A: 1,2,3 mutually cos≈1 → only 1 survives
    assert(out(1L), "min id must survive")
    assert(!out(2L) && !out(3L), "near-identical larger ids must drop")
    // bundle B: 20,21 similar → 20 survives; 30 (cos≈0.9 to 20) kept at tau=0.99
    assert(out(20L) && !out(21L))
    assert(out(30L), "dissimilar member must survive")
  }

  test("cluster labels are canonical min member ids") {
    val rows = SemDedup.prune(emb, "vec", "vec_id", nClusters = 2, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 1L && rows(2L) == 1L && rows(3L) == 1L)
    assert(rows(20L) == 20L && rows(21L) == 20L && rows(30L) == 20L)
  }

  test("pruning is cluster-local: cross-cluster similars are not compared") {
    // same DIRECTION at different magnitudes: cosine-identical across
    // the two k-means (Euclidean) clusters. A global threshold join
    // would drop vec 10 against vec 1 (cos = 1); the cluster-local scan
    // never compares them, so 10 survives as its cluster's minimum.
    val e = Seq(
      (1L, Seq(10.0, 0.0)), (2L, Seq(10.0, 0.001)),
      (10L, Seq(1000.0, 0.0)), (11L, Seq(1000.0, 0.001)))
      .toDF("vec_id", "vec")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))
    // explicit centroids (the build-once pruneWith surface): a 4-point
    // random-init fit can collapse both centroids into one bundle, which
    // is a quantizer-quality concern, not the prune semantics under test
    val out = SemDedup.pruneWith(e, "vec", "vec_id",
      Array(Array(10.0, 0.0), Array(1000.0, 0.0)), tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 10L -> true, 11L -> false))
  }

  test("deterministic per pinned layout (fit + prune)") {
    val pinned = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .repartition(4, col("vec_id")).sortWithinPartitions("vec_id")
    def run() = SemDedup.prune(pinned, "embedding", "vec_id",
      nClusters = 4, tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(run() == run())
  }

  test("keep column partitions the corpus: survivors + dropped = all") {
    val out = SemDedup.prune(emb, "vec", "vec_id", nClusters = 2, tau = 0.99)
    assert(out.count() == 6)
    assert(out.select("vec_id").distinct().count() == 6)
  }

  test("mega-cell guard: an adversarial all-near-identical corpus stays bounded") {
    // 5000 near-identical embeddings collapse into ONE cell — without
    // the guard the pair join is 12.5M pairs in one group; with
    // maxCellSize=500 it sub-splits into ~10 hash slices, each scanning
    // only its own pairs
    val n = 5000
    val adversarial = spark.range(1, n + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0) + col("id").cast("double") * 1e-9, lit(0.0)).as("vec"))
    val out = SemDedup.pruneWith(adversarial, "vec", "vec_id",
      Array(Array(1.0, 0.0)), tau = 0.999, maxCellSize = 500)
      .collect()
    assert(out.length == n)
    // all one canonical cluster (labeling spans the FULL cell)
    assert(out.forall(_.getLong(1) == 1L))
    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    // each of the ceil(5000/500)=10 hash slices keeps exactly its own
    // minimum (everything is mutually similar): bounded degradation,
    // never zero survivors, never more than one per slice
    assert(kept.contains(1L), "global min id must survive")
    assert(kept.size == 10, s"one survivor per sub-cell expected, got ${kept.size}")
  }

  test("mega-cell guard is inert below the cap: identical output either way") {
    val centroids = Array(Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0))
    def runWith(cap: Int) = SemDedup.pruneWith(emb, "vec", "vec_id",
      centroids, tau = 0.99, maxCellSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(runWith(1000000) == runWith(3))
  }
}
