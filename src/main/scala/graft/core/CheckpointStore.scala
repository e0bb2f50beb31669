package graft.core

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Fingerprint-keyed parquet checkpoint cache — the Spark analog of the
  * reference's content-addressed job cache (`CachedDataLoadingJob` keyed
  * by `cache_dir/name` with `ParameterInvariant`/`FunctionInvariant`
  * invalidation, mdataframe.py:189-193, 208-230, 311-317): the ONE real
  * optimization the reference implements itself (SURVEY.md §4 caching
  * row). Catalyst supplies laziness for free; this supplies
  * cross-session reuse: a chain result is materialized once under
  * `dir/<sha256(chain fingerprint + input key)>` and read back on every
  * later request with the same key.
  *
  * Invalidation follows the reference's model: the key is derived from
  * operator parameters (the `Transformer.fingerprint` sha256) plus a
  * caller-supplied input key (dataset version/path — the analog of the
  * reference's FileInvariant). Changing either produces a new directory;
  * stale entries are simply unreferenced (remove by age with [[prune]]).
  *
  * Collision caveat: Dataset-valued operator parameters fingerprint as
  * schema + the analyzed plan's semantic hash (Transformer.render) — NOT
  * row content. Two frames with the same plan always key the same entry;
  * if the underlying DATA changed without the plan changing (a parquet
  * path whose files were rewritten in place), the caller must fold a
  * version into `inputKey`, exactly as the reference folds FileInvariants
  * into its job keys.
  */
final case class CheckpointStore(dir: String) {

  private def pathFor(key: String): String =
    s"$dir/${Transformer.sha256(key)}"

  def contains(key: String): Boolean =
    Files.exists(Paths.get(pathFor(key), "_SUCCESS"))

  /** Best-effort access stamp for [[pruneToSize]]'s LRU order: a marker
    * file touched on every cache read. Failure is swallowed — a
    * read-only or object-store-backed dir degrades to eviction by
    * materialization age, never to a failed read. */
  private def touchAccess(p: String): Unit =
    try {
      val m = Paths.get(p, "_ACCESS")
      if (Files.exists(m))
        Files.setLastModifiedTime(m,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      else Files.createFile(m)
    } catch { case _: Exception => () }

  /** Materialize `df` under `key` if absent; always returns the cached
    * read (so downstream plans cut lineage at the checkpoint). */
  def materialize(df: DataFrame, key: String): DataFrame = {
    val p = pathFor(key)
    if (!contains(key)) df.write.mode("overwrite").parquet(p)
    touchAccess(p)
    df.sparkSession.read.parquet(p)
  }

  /** The out-of-band age pruning the class doc promises: delete every
    * checkpoint entry whose completed materialization (`_SUCCESS` mtime)
    * is older than `maxAgeMillis`, plus STALE entries with no `_SUCCESS`
    * (crashed half-writes). An incomplete dir is only removed once its
    * own mtime is past the cutoff too — a no-`_SUCCESS` dir with recent
    * mtime is a materialization in progress (part files are landing in
    * it right now), and deleting it would fail the concurrent writer.
    * A key pruned here simply re-materializes on next request. Returns
    * the number of entries removed. */
  def prune(maxAgeMillis: Long): Int = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return 0
    val cutoff = System.currentTimeMillis() - maxAgeMillis
    val entries = Files.list(root)
    try {
      entries.iterator().asScala
        .filter(Files.isDirectory(_))
        .filter { d =>
          val success = d.resolve("_SUCCESS")
          val stamp = if (Files.exists(success)) success else d
          Files.getLastModifiedTime(stamp).toMillis < cutoff
        }
        .map { d =>
          // delete children before the directory itself
          val files = Files.walk(d)
          try files.iterator().asScala.toSeq.reverseIterator.foreach(Files.delete)
          finally files.close()
        }
        .length
    } finally entries.close()
  }

  /** Size-bounded LRU eviction (r10 VERDICT ask #8): delete
    * least-recently-used complete entries until the store's total size
    * is at most `maxBytes`. "Recently used" is the `_ACCESS` marker
    * [[materialize]]/[[apply]] touch on every cache read, falling back
    * to the `_SUCCESS` materialization time for entries never re-read
    * (or on filesystems where the touch failed). In-progress entries
    * (no `_SUCCESS` yet — a concurrent materialization is landing part
    * files) are never deleted here; [[prune]] ages those out. An evicted
    * key simply re-materializes on next request. Returns the number of
    * entries removed.
    *
    * 100 TB posture: run this out-of-band (the prune cadence), not
    * inline on every write — sizing walks the whole store once.
    *
    * READER CONTRACT: [[materialize]]/[[apply]] return a LAZY
    * `spark.read.parquet` of the entry — a job consuming that frame
    * reads the files long after the call returned. `minIdleMillis`
    * (default 15 min) is the guard: an entry whose `_ACCESS` is newer
    * than that is presumed to have an in-flight reader and is skipped
    * even when the store is over budget, so eviction can't become a
    * mid-job `FileNotFoundException`. Size the idle window to the
    * longest job that consumes a checkpoint, or `.persist()`/re-write
    * frames that must outlive it. */
  def pruneToSize(maxBytes: Long, minIdleMillis: Long = 15 * 60 * 1000L): Int = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return 0
    case class Entry(path: java.nio.file.Path, bytes: Long, lastUsed: Long)
    val dirs = Files.list(root)
    val entries = try {
      dirs.iterator().asScala
        .filter(Files.isDirectory(_))
        .filter(d => Files.exists(d.resolve("_SUCCESS")))
        .map { d =>
          val files = Files.walk(d)
          val bytes = try files.iterator().asScala
            .filter(Files.isRegularFile(_)).map(Files.size).sum
          finally files.close()
          val access = d.resolve("_ACCESS")
          val stamp = if (Files.exists(access)) access else d.resolve("_SUCCESS")
          Entry(d, bytes, Files.getLastModifiedTime(stamp).toMillis)
        }.toSeq
    } finally dirs.close()
    var total = entries.map(_.bytes).sum
    var removed = 0
    val idleCutoff = System.currentTimeMillis() - minIdleMillis
    // oldest access first; path as the deterministic tiebreak; entries
    // accessed within the idle window are presumed to have in-flight
    // lazy readers and stay put even over budget
    for (e <- entries.sortBy(e => (e.lastUsed, e.path.toString))
         if total > maxBytes && e.lastUsed < idleCutoff) {
      val files = Files.walk(e.path)
      try files.iterator().asScala.toSeq.reverseIterator.foreach(Files.delete)
      finally files.close()
      total -= e.bytes
      removed += 1
    }
    removed
  }

  /** Apply a transformer with checkpointing: cache hit skips executing
    * `t` (and its whole upstream plan) entirely. `inputKey` identifies
    * the input dataset (path + version). */
  def apply(t: Transformer, input: => DataFrame, inputKey: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val key = t.fingerprint + "|" + inputKey
    val p = pathFor(key)
    if (!contains(key)) t(input).write.mode("overwrite").parquet(p)
    touchAccess(p)
    spark.read.parquet(p)
  }
}
