package graft

import org.apache.spark.sql.functions._
import graft.core.{CheckpointStore, Transformer}
import java.util.concurrent.atomic.AtomicInteger

/** Fingerprint-keyed checkpoint cache (reference cache semantics,
  * mdataframe.py:208-230/311-317): hit skips recompute, parameter change
  * invalidates, input-key change invalidates. */
class CheckpointStoreSpec extends SparkSpec {

  import spark.implicits._

  test("cache hit skips executing the transformer; key changes invalidate") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val store = CheckpointStore(dir)
    val executions = CheckpointStoreSpec.executions
    executions.set(0)

    def mkT(factor: Double) = Transformer("scaleBy", Seq(factor)) { df =>
      CheckpointStoreSpec.executions.incrementAndGet()
      df.withColumn("v", col("v") * factor)
    }
    def input = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")

    val t2 = mkT(2.0)
    val r1 = store(t2, input, "fixture-v1").orderBy("id").collect().map(_.getDouble(1))
    assert(r1.toSeq == Seq(4.0, 6.0))
    assert(executions.get() == 1)

    // same transformer + same input key → cache hit, no execution
    val r2 = store(t2, input, "fixture-v1").orderBy("id").collect().map(_.getDouble(1))
    assert(r2.toSeq == Seq(4.0, 6.0))
    assert(executions.get() == 1, "second call must hit the cache")

    // equal params, different instance → same fingerprint → still a hit
    store(mkT(2.0), input, "fixture-v1").collect()
    assert(executions.get() == 1)

    // parameter change → new fingerprint → recompute
    val r3 = store(mkT(3.0), input, "fixture-v1").orderBy("id").collect().map(_.getDouble(1))
    assert(r3.toSeq == Seq(6.0, 9.0))
    assert(executions.get() == 2)

    // input-version change → recompute
    store(t2, input, "fixture-v2").collect()
    assert(executions.get() == 3)
  }

  test("Dataset params fingerprint by plan identity, not schema alone") {
    implicit val s = spark
    // two annotation tables with IDENTICAL schemas but different content:
    // schema-only rendering would give them the same fingerprint, and the
    // store would silently serve the first table's output for the second
    val annoA = Seq((1L, "x")).toDF("id", "tag")
    val annoB = Seq((1L, "y")).toDF("id", "tag")
    def annotate(anno: org.apache.spark.sql.DataFrame) =
      Transformer("annotate", Seq(anno)) { df =>
        df.join(broadcast(anno), Seq("id"), "left")
      }
    assert(annotate(annoA).fingerprint != annotate(annoB).fingerprint,
      "different tables with equal schemas must not collide")
    // …while the SAME table twice still collides on purpose (cache hit)
    assert(annotate(annoA).fingerprint == annotate(annoA).fingerprint)

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    val store = CheckpointStore(dir)
    val input = Seq((1L, 2.0)).toDF("id", "v")
    val rA = store(annotate(annoA), input, "k").collect()(0).getString(2)
    val rB = store(annotate(annoB), input, "k").collect()(0).getString(2)
    assert(rA == "x" && rB == "y",
      s"store served a colliding checkpoint: rA=$rA rB=$rB")
  }

  test("prune removes aged and incomplete entries, keeps fresh ones") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt3").toString
    val store = CheckpointStore(dir)
    val input = Seq((1L, 2.0)).toDF("id", "v")
    val t = Transformer("identity", Seq(1.0))(df => df)

    store(t, input, "old").collect()
    store(t, input, "fresh").collect()
    // a crashed half-write: STALE directory without _SUCCESS
    val partial = java.nio.file.Paths.get(dir, "deadbeef-partial")
    java.nio.file.Files.createDirectory(partial)
    java.nio.file.Files.writeString(partial.resolve("part-0.parquet"), "junk")
    java.nio.file.Files.setLastModifiedTime(partial,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600 * 1000L))
    // an IN-PROGRESS write: no _SUCCESS yet but recent mtime — pruning it
    // would fail the concurrent materialization mid-flight
    val inflight = java.nio.file.Paths.get(dir, "deadbeef-inflight")
    java.nio.file.Files.createDirectory(inflight)
    java.nio.file.Files.writeString(inflight.resolve("part-0.parquet"), "junk")

    // age the "old" entry's _SUCCESS two hours into the past
    def entryDir(key: String) =
      java.nio.file.Paths.get(dir, Transformer.sha256(t.fingerprint + "|" + key))
    java.nio.file.Files.setLastModifiedTime(
      entryDir("old").resolve("_SUCCESS"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600 * 1000L))

    val removed = store.prune(maxAgeMillis = 3600 * 1000L)
    assert(removed == 2, s"expected old+stale-partial pruned, got $removed")
    assert(!java.nio.file.Files.exists(entryDir("old")))
    assert(!java.nio.file.Files.exists(partial))
    assert(java.nio.file.Files.exists(inflight.resolve("part-0.parquet")),
      "a recent incomplete write must survive pruning")
    assert(java.nio.file.Files.exists(entryDir("fresh").resolve("_SUCCESS")))

    // a pruned key transparently re-materializes on the next request
    assert(store(t, input, "old").count() == 1)
    assert(store.contains(t.fingerprint + "|" + "old"))
  }

  test("pruneToSize: LRU eviction to a byte budget; re-read entries survive") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt4").toString
    val store = CheckpointStore(dir)
    val input = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val t = Transformer("identity", Seq(1.0))(df => df)
    def entryDir(key: String) =
      java.nio.file.Paths.get(dir, Transformer.sha256(t.fingerprint + "|" + key))
    def ageAccess(key: String, hoursAgo: Int): Unit =
      java.nio.file.Files.setLastModifiedTime(entryDir(key).resolve("_ACCESS"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - hoursAgo * 3600 * 1000L))

    Seq("k1", "k2", "k3").foreach(k => store(t, input, k).collect())
    // k1 oldest access, k2 middle, k3 just used
    ageAccess("k1", 3); ageAccess("k2", 2)
    // re-reading k1 refreshes its access stamp → k2 becomes the LRU entry
    store(t, input, "k1").collect()

    def size(key: String): Long = {
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(entryDir(key))
      try files.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => java.nio.file.Files.size(p)).sum
      finally files.close()
    }
    val each = size("k1")
    // budget for two entries: exactly the LRU one (k2) goes
    val removed = store.pruneToSize(maxBytes = each * 2 + each / 2)
    assert(removed == 1, s"expected exactly the LRU entry evicted, got $removed")
    assert(!java.nio.file.Files.exists(entryDir("k2")))
    assert(store.contains(t.fingerprint + "|k1"))
    assert(store.contains(t.fingerprint + "|k3"))

    // the idle-age guard: k1/k3 were read moments ago, so a lazy
    // spark.read of them may still be consuming files — the default
    // 15-min window refuses to evict them even at a zero budget
    assert(store.pruneToSize(maxBytes = 0L) == 0,
      "entries accessed within the idle window must survive eviction")

    // an in-flight (no _SUCCESS) dir is never evicted by size
    val inflight = java.nio.file.Paths.get(dir, "deadbeef-inflight")
    java.nio.file.Files.createDirectory(inflight)
    java.nio.file.Files.writeString(inflight.resolve("part-0.parquet"), "junk")
    // with the guard waived: evicts k1+k3, never the in-flight dir
    assert(store.pruneToSize(maxBytes = 0L, minIdleMillis = 0L) == 2)
    assert(java.nio.file.Files.exists(inflight.resolve("part-0.parquet")))

    // an evicted key transparently re-materializes
    assert(store(t, input, "k2").count() == 2)
  }
}

object CheckpointStoreSpec {
  /** JVM-wide counter so executor-side increments are visible in
    * local-mode tests. */
  val executions = new AtomicInteger(0)
}
