package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persistable benchmark gram-set index for decontamination — the
  * build-once/serve-many form of the eval side of
  * [[Dedup.contaminatedDocs]]/[[Dedup.decontaminate]] (north-star
  * extension, SURVEY.md §2.13), completing the screen-input index
  * family: near-dup has [[LshIndex]], the span scrub has [[SpanIndex]],
  * and with this the eval set — the last input the ingestion screens
  * still took as a raw frame — gets the same treatment. A production
  * deployment reduces its eval suites to their distinct n-gram table
  * ONCE, persists it, and every ingestion session (or per-batch
  * foreachBatch plan) decontaminates against the loaded frame instead
  * of re-deriving grams from the raw eval corpus.
  *
  * Contents are exactly the frame the ad-hoc operator derives:
  * [[Dedup.evalGramSet]] — one `gram` column of RAW normalized n-gram
  * strings. Storing strings (not hashes) keeps the exact path's
  * broadcast string join bit-identical to [[Dedup.contaminatedDocs]]
  * (spec-pinned; gate q_eval_index runs against the q_decontaminate
  * oracle SQL verbatim) while the Bloom path derives its xxhash64
  * longs from the same frame. The gram width `n` rides in the meta so
  * a probe cannot silently run a mismatched geometry (a 13-gram index
  * flagging 5-gram probes would miss real contamination).
  *
  * Scale shape: [[EvalIndex.build]] pays one eval-corpus scan + one
  * distinct shuffle of the (eval-sized, small-by-definition) gram
  * table; [[EvalIndex#contaminated]] is stateless on the corpus side —
  * either one broadcast-hash-join pass (exact, `bloomFpp = 0`) or a
  * map-side Bloom probe with NO join (`bloomFpp > 0` — the Dolma-style
  * path for mega-suites whose gram strings outgrow broadcast; never
  * under-flags, over-flags at ≤ fpp per gram). The Bloom form persists:
  * [[EvalIndex#save]] with `bloomFpp > 0` aggregates the filter ONCE
  * and writes its bytes beside the grams (Spark's sketch filter is
  * deterministic — fixed seeds, bit-OR merge), so a loaded index serves
  * Bloom flags with no per-session aggregate. [[EvalIndex#append]]
  * unions an increment's gram set and re-distincts; grams carry no doc
  * ids, so append(A,B) == build(A ∪ B) EXACTLY (distinct-of-union ≡
  * union-of-distincts; spec-pinned as frame equality). An append DROPS
  * a carried Bloom (it describes the old gram set; re-save to rebuild). */
object EvalIndex {

  final case class EvalIndex(grams: DataFrame, n: Int,
      bloom: Option[(Double, BloomFilter)] = None) {

    /** Flag corpus docs sharing ANY indexed n-gram — bit-identical to
      * [[Dedup.contaminatedDocs]] over the eval set this index was
      * built from (spec-pinned). Output: (idCol, n_hits). With
      * `bloomFpp > 0` and a PERSISTED filter present, the saved filter
      * serves the probe directly (its recorded fpp wins — it is already
      * sized); otherwise the filter aggregates from the gram frame per
      * session. */
    def contaminated(corpus: DataFrame, textCol: String, idCol: String,
        bloomFpp: Double = 0.0): DataFrame =
      Dedup.contaminatedAgainstGrams(corpus, grams, textCol, idCol, n,
        bloomFpp,
        prebuiltBloom = if (bloomFpp > 0.0) bloom.map(_._2) else None)

    /** Drop every flagged doc — [[Dedup.decontaminate]] served by the
      * index (same input-retain discipline: the corpus plan feeds both
      * the gram explode and the anti-join). */
    def decontaminate(corpus: DataFrame, textCol: String, idCol: String,
        bloomFpp: Double = 0.0): DataFrame = {
      val input = graft.core.CacheScope.retainInput(corpus)
      input.join(contaminated(input, textCol, idCol, bloomFpp)
        .select(idCol), Seq(idCol), "left_anti")
    }

    /** Fold a new eval suite in: the increment pays its own gram-set
      * reduction, the union re-distincts (one shuffle of the eval-sized
      * gram table). No id contract — grams are anonymous strings, so
      * append(A,B) == build(A ∪ B) exactly. Any carried Bloom filter is
      * DROPPED (it describes the pre-append gram set; save with
      * `bloomFpp > 0` to rebuild). */
    def append(increment: DataFrame, textCol: String): EvalIndex =
      EvalIndex(grams
        .unionByName(Dedup.evalGramSet(increment, textCol, n))
        .distinct(), n)

    /** Persist under `dir`: grams/ (strings, parquet), meta/ one row of
      * the gram width + Bloom fpp, and — when `bloomFpp > 0` —
      * bloom/filter.bin: the grams' xxhash64 longs aggregated into a
      * Bloom filter ONCE, so every later [[load]]+[[contaminated]]
      * session probes map-side with no aggregate. Written through the
      * Hadoop FS API, so the dir may live on any cluster filesystem. */
    def save(dir: String, bloomFpp: Double = 0.0): Unit = {
      val spark = grams.sparkSession
      grams.write.mode("overwrite").parquet(s"$dir/grams")
      import spark.implicits._
      Seq((n, bloomFpp)).toDF("decontam_n", "bloom_fpp")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
      if (bloomFpp > 0.0) {
        val saved = spark.read.parquet(s"$dir/grams")
          .select(xxhash64(col("gram")).as("__h")).distinct()
        val bf = saved.stat.bloomFilter("__h", math.max(saved.count(), 1L), bloomFpp)
        val path = new org.apache.hadoop.fs.Path(s"$dir/bloom/filter.bin")
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val out = fs.create(path, true)
        try bf.writeTo(out) finally out.close()
      }
    }
  }

  /** Reduce the eval set to its distinct gram table once — exactly the
    * frame the ad-hoc operator derives per call. */
  def build(benchmark: DataFrame, textCol: String, n: Int = 13): EvalIndex =
    EvalIndex(Dedup.evalGramSet(benchmark, textCol, n), n)

  /** Restore a [[build]]-then-[[EvalIndex#save]]d index. Meta read BY
    * NAME and validated loudly — a mutated/truncated meta fails here
    * naming the field, not later as a wrong-width flag pass. A
    * persisted Bloom filter loads with the index and serves every
    * Bloom flag pass aggregate-free. */
  def load(spark: SparkSession, dir: String): EvalIndex = {
    val metaDf = spark.read.parquet(s"$dir/meta")
    require(metaDf.columns.contains("decontam_n"),
      s"EvalIndex.load: $dir/meta is missing field decontam_n — not a saved " +
        s"EvalIndex (have: ${metaDf.columns.mkString(", ")})")
    val meta = metaDf.head
    val n = meta.getAs[Int]("decontam_n")
    require(n >= 1,
      s"EvalIndex.load: $dir/meta has invalid decontam_n = $n — corrupt meta")
    val grams = spark.read.parquet(s"$dir/grams")
    require(grams.columns.contains("gram"),
      s"EvalIndex.load: $dir/grams has no gram column " +
        s"(have: ${grams.columns.mkString(", ")})")
    // bloom_fpp is absent from pre-Bloom saves — treat as no filter
    val fpp =
      if (metaDf.columns.contains("bloom_fpp")) meta.getAs[Double]("bloom_fpp") else 0.0
    val bloom =
      if (fpp <= 0.0) None
      else {
        val path = new org.apache.hadoop.fs.Path(s"$dir/bloom/filter.bin")
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(path),
          s"EvalIndex.load: $dir/meta records bloom_fpp = $fpp but " +
            s"$dir/bloom/filter.bin is missing — corrupt index")
        val in = fs.open(path)
        try Some((fpp, BloomFilter.readFrom(in))) finally in.close()
      }
    EvalIndex(grams.select("gram"), n, bloom)
  }
}
