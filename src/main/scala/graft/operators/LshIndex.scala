package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Persistable MinHash-LSH near-duplicate index — the build-once/
  * serve-many form of [[Dedup.nearDupAgainst]] (north-star extension,
  * SURVEY.md §2.13), completing the repo's index family
  * ([[graft.operators.Similarity.IvfIndex]], `Bm25.Bm25Index`,
  * [[graft.operators.Hnsw]]): a production ingestion screen builds the
  * frozen corpus' band/shingle structures ONCE, persists them, and
  * every arriving batch probes them — instead of re-deriving the corpus
  * side per call, which is what `nearDupAgainst` does when no caller
  * holds its caches across sessions.
  *
  * Contents mirror the two corpus-side frames of the ad-hoc join:
  * `bands` (corpus_id, band, bucket — NARROW rows, the join skeleton)
  * and `shingles` (corpus_id, sorted 64-bit shingle hashes — read only
  * by the verification join). Banding parameters ride in the meta so a
  * probe cannot silently run a mismatched geometry (probing 16×8 bands
  * with a 32×4 signature would quietly lose the S-curve guarantee).
  *
  * Scale shape: [[LshIndex.build]] pays one shuffle of the corpus by id
  * plus the band explode; [[LshIndex#probe]] is stateless on the probe
  * side (streaming-capable, same as `nearDupAgainst`) — one equi-join
  * against the prebuilt narrow bands and one hash-join back to the
  * shingles for verification. [[LshIndex#append]] is append-only: the
  * increment pays its own shingle/band pass and the frames union —
  * existing rows are never recomputed (DedupSpec pins append(A,B) ==
  * build(A∪B) and probe(index) == nearDupAgainst, plus the
  * save→load→probe round-trip). `save` lays the band rows out
  * partitioned by `band` — a saved index reopens with band-pruned
  * reads where a probe restricts bands — while the shingle frame,
  * which carries no band, lands unpartitioned.
  */
object LshIndex {

  final case class LshIndex(bands: DataFrame, shingles: DataFrame,
      shingleK: Int, nBands: Int, rowsPerBand: Int, idCol: String) {

    /** Screen probe docs against the indexed corpus: verified pairs
      * (probe_id, corpus_id, jaccard ≥ threshold) — bit-identical to
      * [[Dedup.nearDupAgainst]] over the same corpus (spec-pinned).
      * The probe side is stateless, so `probe` may be a Structured
      * Streaming frame; index frames serve from the bounded cache. */
    def probe(probeDf: DataFrame, textCol: String, probeIdCol: String,
        jaccardThreshold: Double = 0.8, dedupePairs: Boolean = true): DataFrame = {
      val corpusBands = bands
        .select(col(idCol).as("corpus_id"), col("band"), col("bucket"))
        .pipe(graft.core.CacheScope.retain)
      val corpusSh = shingles
        .select(col(idCol).as("corpus_id"), col("__hs").as("corpus_hs"))
        .pipe(graft.core.CacheScope.retain)
      val probeBands = Dedup.bandExplode(
        Dedup.hashedShingles(probeDf, textCol, probeIdCol, shingleK)
          .select(col(probeIdCol).as("probe_id"), col("__hs")),
        nBands, rowsPerBand, Seq("probe_id", "__hs"))
        .select(col("probe_id"), col("__hs").as("probe_hs"),
          col("band"), col("bucket"))
      graft.plans.GraftExtensions.register(probeDf.sparkSession)
      val verified = probeBands
        .join(corpusBands, Seq("band", "bucket"))
        .where(col("probe_id") =!= col("corpus_id"))
        .join(corpusSh, Seq("corpus_id"))
        .withColumn("jaccard",
          graft.plans.GraftExtensions.jaccardSorted(col("probe_hs"), col("corpus_hs")))
        .where(col("jaccard") >= jaccardThreshold)
        .select("probe_id", "corpus_id", "jaccard")
      if (dedupePairs) verified.dropDuplicates("probe_id", "corpus_id") else verified
    }

    /** Merge an increment WITHOUT touching existing rows: it pays its
      * own shingle/band pass, both frames union append-only. Ids must
      * be disjoint from the indexed corpus (same contract as rebuilding
      * over a union). */
    def append(increment: DataFrame, textCol: String): LshIndex = {
      val input = graft.core.CacheScope.retainInput(increment)
      val sh2 = Dedup.hashedShingles(input, textCol, idCol, shingleK)
      val bands2 = Dedup.bandExplode(sh2, nBands, rowsPerBand, Seq(idCol))
      copy(bands = bands.unionByName(bands2), shingles = shingles.unionByName(sh2))
    }

    /** Forget documents — takedown/opt-out support, the index-family
      * counterpart of [[append]]: drop every band and shingle row of
      * the given ids (one column, any name). EXACT, because the
      * band/shingle derivation is strictly per-document:
      * remove(build(A∪B), ids(B)) == build(A) frame-for-frame, and a
      * probe afterwards can never return a removed id (DedupSpec pins
      * both). One anti-join per frame — takedown lists are small, so
      * the filter broadcasts; ids absent from the index are no-ops. */
    def remove(removedIds: DataFrame): LshIndex = {
      val ids = removedIds
        .select(col(removedIds.columns.head).as(idCol)).distinct()
        .pipe(graft.core.CacheScope.retain)
      copy(bands = bands.join(broadcast(ids), Seq(idCol), "left_anti"),
        shingles = shingles.join(broadcast(ids), Seq(idCol), "left_anti"))
    }

    /** Persist under `dir`: bands/ and shingles/ partitioned by band
      * (band-restricted probes reopen with partition pruning; shingles
      * carry no band, so they land unpartitioned), meta/ one row of the
      * banding geometry. */
    def save(dir: String): Unit = {
      val spark = bands.sparkSession
      bands.write.mode("overwrite").partitionBy("band").parquet(s"$dir/bands")
      shingles.write.mode("overwrite").parquet(s"$dir/shingles")
      import spark.implicits._
      Seq((shingleK, nBands, rowsPerBand, idCol))
        .toDF("shingle_k", "n_bands", "rows_per_band", "id_col")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  /** Build the corpus side once: one id-shuffle + shingle/signature
    * pass + band explode — exactly the frames `nearDupAgainst` derives
    * per call. */
  def build(corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 8): LshIndex = {
    val shuffleP = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val sh = Dedup.hashedShingles(corpus, textCol, idCol, shingleK)
      .repartition(shuffleP, col(idCol))
      .pipe(graft.core.CacheScope.retain)
    val banded = Dedup.bandExplode(sh, bands, rowsPerBand, Seq(idCol))
    LshIndex(banded, sh, shingleK, bands, rowsPerBand, idCol)
  }

  /** Restore a [[build]]-then-[[LshIndex#save]]d index. Meta fields are
    * read BY NAME (a schema evolution cannot silently shift ordinals)
    * and validated loudly: a mutated/truncated meta must fail here with
    * a message naming the field, not later as a wrong-geometry probe
    * that silently loses the S-curve guarantee. */
  def load(spark: SparkSession, dir: String): LshIndex = {
    val metaDf = spark.read.parquet(s"$dir/meta")
    val required = Seq("shingle_k", "n_bands", "rows_per_band", "id_col")
    val missing = required.filterNot(metaDf.columns.contains)
    require(missing.isEmpty,
      s"LshIndex.load: $dir/meta is missing field(s) ${missing.mkString(", ")} — " +
        s"not a saved LshIndex (have: ${metaDf.columns.mkString(", ")})")
    val meta = metaDf.head
    def pos(name: String): Int = {
      val v = meta.getAs[Int](name)
      require(v > 0, s"LshIndex.load: $dir/meta has non-positive $name = $v — corrupt meta")
      v
    }
    val idCol = meta.getAs[String]("id_col")
    require(idCol != null && idCol.nonEmpty,
      s"LshIndex.load: $dir/meta has empty id_col — corrupt meta")
    LshIndex(spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/shingles"),
      pos("shingle_k"), pos("n_bands"), pos("rows_per_band"), idCol)
  }

  /** [[load]] restricted to a subset of bands — the recall/cost dial
    * the band-partitioned layout exists for: probing k of n bands reads
    * only those partitions (parquet partition pruning, verified in
    * PlanSpec) and collides on any of the k bands, so candidate recall
    * follows the S-curve with k in place of n (1 − (1−J^r)^k) while
    * corpus-side read and join volume drop to k/n. The probe side still
    * derives all n bands (its signature is one pass either way); the
    * verification join is unchanged, so every SURVIVING pair is still
    * exact-Jaccard-verified — band restriction can only lose pairs,
    * never admit false ones. */
  def loadBands(spark: SparkSession, dir: String, bands: Seq[Int]): LshIndex = {
    require(bands.nonEmpty, "need at least one band")
    val full = load(spark, dir)
    require(bands.forall(b => b >= 0 && b < full.nBands),
      s"bands must be in [0, ${full.nBands}), got $bands")
    full.copy(bands = full.bands.where(col("band").isin(bands.map(Integer.valueOf): _*)))
  }
}
