package graft.core

import org.apache.spark.sql.Dataset

/** Bounded registry for caches that back a RETURNED frame.
  *
  * Operators cache two kinds of intermediates:
  *
  *  - scratch frames whose last action happens INSIDE the operator —
  *    those are unpersisted by the operator itself (try/finally);
  *  - frames the returned plan still reads, materialized by an internal
  *    action (trend-fit collects, BH passes, KMeans fits). Unpersisting
  *    those before the caller's action would throw the materialized work
  *    away, so they must outlive `apply` — but a long-lived session that
  *    never unpersists them accumulates cached blocks until LRU eviction
  *    and disk spill degrade unrelated jobs.
  *
  * `retain` solves the second case: the cache is registered in a bounded
  * FIFO (`-Dgraft.cache.retained`, default 8) and the oldest entry beyond
  * the cap is unpersisted (non-blocking). Evicting a frame the caller
  * still holds is safe — Spark recomputes it from lineage on next use —
  * so the cap trades recompute for bounded storage, never correctness.
  *
  * RDD-level caches (e.g. the zipWithIndex materialization in
  * [[graft.operators.Similarity.embeddingNearDupPairs]]) are NOT routed
  * here: unreferenced cached RDDs are already unpersisted by Spark's
  * ContextCleaner when they are garbage-collected on the driver, unlike
  * Dataset caches, which the CacheManager holds strongly.
  */
object CacheScope {
  private val Max: Int = Integer.getInteger("graft.cache.retained", 8).intValue()
  private val retained = scala.collection.mutable.ArrayDeque.empty[Dataset[_]]

  /** Cache `ds` and register it for bounded retention; re-retaining an
    * already-registered frame — or any frame with the SAME logical plan —
    * refreshes its position instead of double-registering. Spark's
    * CacheManager keys cached data by plan, so two equal-plan Dataset
    * objects share one cache entry: deduping by object identity would let
    * the older registration's eviction unpersist the shared data out from
    * under the newer one (perf-only, lineage recomputes — but it defeats
    * the retention guarantee). Returns `ds` for chaining. */
  def retain[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.cache()
    val plan = ds.queryExecution.analyzed
    retained.filterInPlace(d => (d ne ds) && !d.queryExecution.analyzed.sameResult(plan))
    retained.append(ds)
    while (retained.length > Max) retained.removeHead().unpersist(blocking = false)
    ds
  }

  /** [[retain]] + eager materialization. A lazily-cached frame with an
    * EXPENSIVE lineage and several independent consumers is a trap under
    * AQE: the consumers' leaf query stages are submitted concurrently,
    * and racing tasks each recompute the uncached ancestor — measured
    * 4 concurrent full evaluations of the winnowing-fingerprint scan
    * (stage probe, r13 optimization round) where the cache was supposed
    * to give one. Materializing here (one pass, all columns — count()
    * over the just-cached frame builds every partition of the
    * InMemoryRelation) costs one extra tiny job and makes every
    * downstream consumer a cache read. Use for caches whose lineage is
    * expensive AND fan out to 2+ independent consumers; plain [[retain]]
    * stays right for single-consumer or cheap-lineage caches. */
  def retainEager[T](ds: Dataset[T]): Dataset[T] = {
    retain(ds)
    ds.count()
    ds
  }

  /** [[retain]] for a CALLER-provided input frame: if the caller already
    * cached it, reuse that cache without adopting it — registering a
    * user-owned cache in the FIFO would let a later eviction unpersist
    * storage the user established and still relies on. */
  def retainInput[T](ds: Dataset[T]): Dataset[T] =
    if (ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE) ds
    else retain(ds)

  /** Number of currently retained caches (test hook). */
  def size: Int = synchronized(retained.length)

  /** Unpersist and drop every retained cache (e.g. at session shutdown). */
  def releaseAll(): Unit = synchronized {
    retained.foreach(_.unpersist(blocking = false))
    retained.clear()
  }
}
