package graft

import graft.core.CacheScope
import org.apache.spark.storage.StorageLevel

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def isCached(ds: org.apache.spark.sql.Dataset[_]): Boolean =
    ds.storageLevel != StorageLevel.NONE

  test("retain caches the frame and evicts the oldest beyond the cap") {
    CacheScope.releaseAll()
    val frames = (0 until 10).map(i => Seq(i).toDF("v"))
    frames.foreach(CacheScope.retain(_))
    assert(CacheScope.size == 8) // -Dgraft.cache.retained default
    assert(!isCached(frames(0)) && !isCached(frames(1)))
    assert(frames.drop(2).forall(isCached))
    CacheScope.releaseAll()
    assert(CacheScope.size == 0)
    assert(frames.forall(!isCached(_)))
  }

  test("re-retaining refreshes position instead of double-registering") {
    CacheScope.releaseAll()
    // distinct literals: Spark's CacheManager keys caches by logical plan,
    // so equal-plan frames share (and lose) cache entries together
    val a = Seq(999).toDF("v")
    val rest = (0 until 7).map(i => Seq(i).toDF("v"))
    CacheScope.retain(a)
    rest.foreach(CacheScope.retain(_))
    CacheScope.retain(a) // refresh: a moves to the back
    Seq(100, 101).map(i => Seq(i).toDF("v")).foreach(CacheScope.retain(_))
    // two evictions hit the two oldest of `rest`, not `a`
    assert(isCached(a))
    assert(!isCached(rest(0)) && !isCached(rest(1)))
    CacheScope.releaseAll()
  }

  test("equal-plan re-retention dedupes by plan, protecting the shared cache") {
    CacheScope.releaseAll()
    // two DISTINCT Dataset objects over the same logical plan share one
    // CacheManager entry; registering both then evicting the older one
    // would unpersist the shared data under the newer registration
    val base = Seq(42).toDF("v")
    val again = Seq(42).toDF("v") // same plan as base, different object
    CacheScope.retain(base)
    CacheScope.retain(again) // dedupes the base registration by sameResult
    assert(CacheScope.size == 1)
    // fill to the cap: the single merged registration survives 7 more adds
    (0 until 7).foreach(i => CacheScope.retain(Seq(i + 100).toDF("v")))
    assert(CacheScope.size == 8)
    assert(isCached(base) && isCached(again))
    CacheScope.releaseAll()
  }

  test("an evicted frame is still usable (recomputed from lineage)") {
    CacheScope.releaseAll()
    val first = Seq(1, 2, 3).toDF("v")
    CacheScope.retain(first)
    (0 until 8).foreach(i => CacheScope.retain(Seq(i).toDF("v")))
    assert(!isCached(first))
    assert(first.count() == 3)
    CacheScope.releaseAll()
  }
}
