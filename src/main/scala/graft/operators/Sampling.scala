package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation — the "balance the mix"
  * step after filtering/dedup: cap the number of documents per group
  * (source / domain / language) so no single origin dominates the
  * training mix.
  *
  * Selection is the n smallest ENGINE-PORTABLE hashes per group
  * ([[graft.functions.TextFunctions.portableHash]] of id and seed):
  * deterministic across runs, reshuffles, and engines (a DuckDB oracle
  * reproduces the exact sample), and uniform over each group — i.e. a
  * fixed-size simple random sample per group with a reproducible seed.
  *
  * Scale shape: the naive form — `row_number() OVER (PARTITION BY group
  * ORDER BY hash)` then `<= quota` — sorts EVERY row of a group inside
  * one task, which dies on a billion-row group. This implementation
  * pre-filters map-side with a per-group hash threshold chosen from the
  * group counts (quota/count scaled with slack), so the exact window
  * ranks only ~quota·(1+slack) candidate rows per group; a driver-side
  * check retries with a doubled threshold for any group the slack
  * under-served (vanishingly rare — binomial tail; the loop is bounded
  * and each pass is one map-side filter). Output is the EXACT top-quota
  * by hash order regardless of which pass served it. */
object Sampling {

  private val HashSpan = math.pow(2.0, 60.0) // portableHash range [0, 2^60)

  /** Greedy k-center (farthest-first traversal, Gonzalez 1985) diverse
    * subset selection over an embedding column — the coreset/diversity
    * sampling primitive (pick k maximally-spread exemplars; the
    * selection radius is the classic 2-approximation certificate for
    * the k-center cover).
    *
    * Deterministic and seed-free on the exact path: the first center is
    * the smallest id; each subsequent step takes the row maximizing its
    * cosine distance to the NEAREST already-chosen center, ties to the
    * smallest id. Output: one row per selection, (rank, <idCol>,
    * radius) — radius is the winning min-distance (null for rank 0);
    * radii are non-increasing by the greedy invariant.
    *
    * Scale shape: k passes over a running (id, vec, min-dist) state,
    * each a map-side update against ONLY the newest center (one
    * broadcast-literal vector) feeding a TakeOrdered(1) — no shuffle,
    * no window, no driver-sized collect, and per-iteration cost FLAT
    * in i (lineage truncated every 16 rounds). Exact greedy costs the
    * k passes by definition; when k·scan is too dear, `sampleCap > 0`
    * runs the SAME greedy driver-side over the bounded deterministic
    * hash sample (the quantizer-fit pattern — flat cost in n,
    * partitioning-invariant). */
  def kCenterSelect(corpus: DataFrame, vecCol: String, idCol: String, k: Int,
      sampleCap: Int = 0, seed: Long = 42L): DataFrame = {
    require(k >= 1, "kCenterSelect: k must be >= 1")
    val spark = corpus.sparkSession
    graft.plans.GraftExtensions.register(spark)
    val u = graft.core.CacheScope.retain(corpus.select(
      col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull))

    def cosDist(v: Column, center: Seq[Double]): Column =
      lit(1.0) - graft.plans.GraftExtensions.cosineSim(v, typedlit(center))

    val selected =
      if (sampleCap > 0) {
        // bounded driver-side greedy: identical tie rules, flat cost in n
        val samp = u.withColumn("__h", xxhash64(to_json(col("__v")), lit(seed)))
          .orderBy(col("__h"), col("__id")).limit(sampleCap)
          .select("__id", "__v").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        require(samp.nonEmpty, "kCenterSelect: empty input")
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          val n = math.min(a.length, b.length)
          while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
          if (na * nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
        }
        val first = samp.minBy(_._1)
        val centers = scala.collection.mutable.ArrayBuffer(first)
        val out = scala.collection.mutable.ArrayBuffer(
          (0, first._1, Option.empty[Double]))
        val minD = scala.collection.mutable.Map(
          samp.map(s => s._1 -> (1.0 - cos(s._2, first._2))): _*)
        val byId = samp.map(s => s._1 -> s._2).toMap
        // chosen ids leave the candidate map (the exact path's explicit
        // exclusion — a zero-norm vector is distance 1 to itself and
        // would re-win forever otherwise)
        minD.remove(first._1)
        for (i <- 1 until math.min(k, samp.length)) {
          val (bid, bd) = minD.toSeq.maxBy { case (id, d) => (d, -id) }
          centers += ((bid, byId(bid)))
          out += ((i, bid, Some(bd)))
          minD.remove(bid)
          minD.keys.foreach { id =>
            val d = 1.0 - cos(byId(id), byId(bid))
            if (d < minD(id)) minD(id) = d
          }
        }
        out.toSeq
      } else {
        val first = u.orderBy(col("__id")).limit(1).collect()(0)
        val firstId = first.getLong(0)
        val out = scala.collection.mutable.ArrayBuffer(
          (0, firstId, Option.empty[Double]))
        // Running min-distance state: (__id, __v, __d) where __d is the
        // distance to the NEAREST chosen center so far. Each iteration
        // updates __d against ONLY the newest center, so per-iteration
        // plan cost is flat in i — the previous form rebuilt a
        // least(d_1..d_i) over every center plus a growing isin()
        // exclusion list, O(k²) expression growth and k-literal filters.
        // min is exactly associative on doubles, so the running form is
        // bit-identical to the all-centers least(). Chosen ids leave the
        // state EXPLICITLY (the =!= filter): normally a center's
        // distance to itself is 0 and can never win, but a zero-norm
        // vector rides the cosine-0 contract (distance 1 to everything,
        // itself included) and would re-win forever. At the gate the
        // exclusion is a no-op (distinct non-zero embeddings), so the
        // oracle's plain argmax replays identically.
        var state = u.where(col("__id") =!= firstId)
          .select(col("__id"), col("__v"),
            cosDist(col("__v"), first.getSeq[Double](1)).as("__d"))
        var exhausted = false
        for (i <- 1 until k if !exhausted) {
          // winner: max running distance, ties to the smallest id
          val top = state.orderBy(desc("__d"), asc("__id")).limit(1).collect()
          if (top.isEmpty) exhausted = true // k past the corpus size
          else {
            val bid = top(0).getLong(0)
            out += ((i, bid, Some(top(0).getDouble(2))))
            state = state.where(col("__id") =!= bid)
              .withColumn("__d",
                least(col("__d"), cosDist(col("__v"), top(0).getSeq[Double](1))))
            // truncate lineage every 16 rounds: the stacked
            // least()/filter tree would otherwise grow Catalyst
            // analysis cost linearly in i. localCheckpoint materializes
            // the small (id, v, d) state, never the corpus.
            if (i % 16 == 0) state = state.localCheckpoint(true)
          }
        }
        out.toSeq
      }
    import spark.implicits._
    selected.map { case (r, id, rad) => (r, id, rad) }
      .toDF("rank", idCol, "radius")
  }

  def quotaPerGroup(df: DataFrame, groupCol: String, idCol: String,
      quota: Int, seed: Long = 42L): DataFrame = {
    require(quota > 0, "quota must be positive")
    val h: Column = graft.functions.TextFunctions.portableHash(
      concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val input = graft.core.CacheScope.retainInput(df)
    val counts = input.groupBy(groupCol).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.get(0), r.getLong(1))).toMap
    // a null group would silently drop through the equi-join below;
    // make the caller normalize (coalesce to a sentinel) instead
    require(!counts.contains(null),
      s"quotaPerGroup: null values in group column '$groupCol' — coalesce them first")

    // slack: 1.5x the quota fraction plus an absolute floor keeps
    // P(missing the quota-th order statistic) below ~1e-9 per group
    var slack = 1.5
    var out: DataFrame = null
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      require(attempts <= 6, "quota sampling failed to converge (hash skew?)")
      val sl = slack
      val spark = df.sparkSession
      import spark.implicits._
      val fracs = counts.toSeq.map { case (g, n) =>
        (g.toString, math.min(1.0, (sl * quota + 64.0) / n.toDouble))
      }.toDF(groupCol, "__frac")
      val w = Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
      val ranked = input
        .join(broadcast(fracs), Seq(groupCol))
        .where(h < col("__frac") * lit(HashSpan))
        .drop("__frac")
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= quota)
      val kept = ranked.groupBy(groupCol).agg(count(lit(1)).as("__k")).collect()
        .map(r => (r.get(0), r.getLong(1))).toMap
      val short = counts.exists { case (g, n) =>
        kept.getOrElse(g, 0L) < math.min(quota.toLong, n)
      }
      if (short) slack *= 4 else { out = ranked.drop("__rk"); done = true }
    }
    out
  }

  /** Deterministic train/validation/test split: each row's bucket is a
    * pure function of (id, seed) — the engine-portable 60-bit hash
    * mapped against integer thresholds — so the assignment is
    * reproducible across runs, partitionings, and engines, and STABLE
    * UNDER CORPUS GROWTH: adding documents never reassigns an existing
    * one (the property random-shuffle splits lack, and the reason
    * production pipelines hash-split: yesterday's eval docs must not
    * leak into tomorrow's train set when the corpus grows).
    *
    * Thresholds are cumulative-fraction cut points of the hash range
    * computed ONCE here as integers — comparisons are integer-only, so
    * there is no float-boundary disagreement for an external oracle to
    * hit. Purely map-side: no shuffle, no state. */
  /** EXACT stratified split: within EVERY group, the seeded-hash-
    * ordered first floor(n_g*w_train/W) docs land in the first split,
    * the next block in the second, and so on — per-group proportions
    * exact to integer rounding, where [[hashSplit]] is exact only in
    * expectation (a small language can land lopsided). Weights are
    * integers and the cuts are integer cross-multiplications
    * (rank*W <= n_g*cumW), so membership replays byte-for-byte in any
    * engine.
    *
    * Scale shape: the grouped two-phase prefix rank (range partition by
    * (group, hash, id) -> per-partition windows + broadcast
    * per-(partition, group) offsets — the perplexityBuckets /
    * tokenBudgetPerGroup discipline), so no group ever sorts through
    * one task; group sizes ride the same one-row-per-(partition, group)
    * aggregate. Group cardinality bounds the broadcast maps — meant
    * for languages/sources/domains, not per-document keys. */
  def stratifiedSplit(df: DataFrame, groupCol: String, idCol: String,
      weights: Seq[(String, Int)], seed: Long = 42L,
      numPartitions: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "stratifiedSplit: need positive integer weights")
    val totW = weights.map(_._2).sum
    val cum = weights.scanLeft(0)(_ + _._2).tail // cumulative weights
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val h = md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val ranged = df.withColumn("__h", h)
      .repartitionByRange(n, col(groupCol), col("__h"), col(idCol))
      .sortWithinPartitions(col(groupCol), col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val cached = graft.core.CacheScope.retain(ranged)
    val counts = cached
      .groupBy(col("__pid"), col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    require(!counts.exists(_._2 == null),
      s"stratifiedSplit: null values in group column '$groupCol' — coalesce them first")
    val offsets: Seq[((Int, String), Long)] = counts.groupBy(_._2).toSeq
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, c) =>
          val off = acc; acc += c; (pid, g) -> off
        }
      }
    val sizes: Map[String, Long] =
      counts.groupBy(_._2).map { case (g, rows) => g -> rows.map(_._3).sum }
    val sep = "\u0001" // unit separator: cannot appear in a decimal pid
    val keyCol = concat_ws(sep, col("__pid").cast("string"),
      col(groupCol).cast("string"))
    val offCol = coalesce(
      element_at(
        map(offsets.flatMap { case ((p, g), o) =>
          Seq(lit(s"$p$sep$g"), lit(o)) }: _*),
        keyCol),
      lit(0L))
    val sizeCol = element_at(
      map(sizes.toSeq.flatMap { case (g, sz) => Seq(lit(g), lit(sz)) }: _*),
      col(groupCol).cast("string"))
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(col("__h"), col(idCol))
    val rankCol = row_number().over(w).cast("long") + offCol
    // first split k with rank*W <= n_g*cumW_k (integer-exact)
    val splitCol = weights.init.zip(cum.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cw), rest) =>
        when(col("__rank") * totW <= sizeCol * cw, name).otherwise(rest)
    }
    cached.withColumn("__rank", rankCol)
      .withColumn("split", splitCol)
      .drop("__h", "__pid", "__rank")
  }

  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h = graft.functions.TextFunctions.portableHash(
      concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val cuts = splitThresholds(fractions)
    // CASE h < t1 THEN n1 WHEN h < t2 THEN n2 ... ELSE last
    val caseExpr = cuts.init.foldRight(lit(fractions.last._1): Column) {
      case ((name, t), rest) => when(h < t, name).otherwise(rest)
    }
    df.withColumn("split", caseExpr)
  }

  /** Leakage-safe train/valid/test split: [[hashSplit]] keyed by the
    * near-dup FAMILY instead of the document, so every member of a
    * connected near-dup family lands on the SAME side and near-dup
    * leakage across the train/eval boundary — the contamination mode
    * Lee et al. 2022 measure (an eval doc whose near-duplicate sits in
    * train memorizes its own answer) — is impossible by construction.
    * Key = the family's min member id
    * ([[graft.operators.Dedup.nearDupClusters]] label); singletons key
    * by their own id, so on an already-deduplicated corpus this is
    * exactly [[hashSplit]] (same hash, same thresholds, same seed).
    *
    * Scale shape: the extra cost over [[hashSplit]] is the LSH pair
    * graph + components (pair-sized, orders of magnitude below the
    * corpus) plus one id-keyed join of the narrow label frame back
    * onto the corpus; the split itself stays the map-side portable
    * hash against integer thresholds. */
  def leakageSafeSplit(df: DataFrame, textCol: String, idCol: String,
      fractions: Seq[(String, Double)], seed: Long = 42L,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val input = graft.core.CacheScope.retainInput(df)
    val clusters = Dedup.nearDupClusters(input, textCol, idCol,
      shingleK, bands, rowsPerBand, jaccardThreshold)
    val keyed = input.join(clusters, Seq(idCol), "left")
      .withColumn("__sk", coalesce(col("cluster"), col(idCol)))
    hashSplit(keyed, "__sk", fractions, seed).drop("__sk", "cluster")
  }

  /** Temperature-based corpus mixing (the multilingual-LM sampling rule,
    * p_s ∝ n_s^alpha): thin each group so the OUTPUT composition follows
    * the temperature-flattened distribution, keeping the corpus as large
    * as that composition allows (the binding group — the one the
    * flattening up-weights most — is kept whole, every other group is
    * Bernoulli-thinned to match). alpha = 1 keeps everything (natural
    * mix); alpha → 0 approaches a uniform mix.
    *
    * Selection is the same engine-portable deterministic hash as
    * [[hashSplit]] against per-group integer thresholds, so membership is
    * a pure function of (id, seed): reproducible across runs and engines,
    * and monotone in alpha per row. Group sizes are read in one aggregate
    * (driver-small: one row per group); the keep filter itself is
    * MAP-SIDE — a broadcast threshold join plus one comparison, no
    * shuffle of the corpus. Thinning is Bernoulli (expected counts, not
    * exact) — use [[quotaPerGroup]] when exact per-group counts matter.
    *
    * [[temperatureThresholds]] exposes the integer thresholds so an
    * external verifier embeds the EXACT literals (OracleFitProbe
    * pattern — they depend on the observed group counts). */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, seed: Long = 42L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val input = graft.core.CacheScope.retainInput(df)
    val counts = input.groupBy(groupCol).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.get(0), r.getLong(1))).toMap
    require(!counts.contains(null),
      s"temperatureMix: null values in group column '$groupCol' — coalesce them first")
    if (counts.isEmpty) return df // empty in, empty out — nothing to thin
    // thresholds are keyed by toString internally; the JOIN below uses
    // the ORIGINAL-typed collected values, so a group type whose
    // string cast does not round-trip its JVM toString (decimal scale,
    // timestamp, boolean) still matches its own rows
    require(counts.keys.map(_.toString).toSet.size == counts.size,
      s"temperatureMix: distinct '$groupCol' values collide on toString")
    val ts = temperatureThresholds(
      counts.map { case (g, n) => (g.toString, n) }, alpha)
    val spark = df.sparkSession
    val gField = input.schema(groupCol)
    import scala.jdk.CollectionConverters._
    val tdf = spark.createDataFrame(
      counts.keys.toSeq.map(g =>
        org.apache.spark.sql.Row(g, ts(g.toString))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        gField.copy(nullable = false),
        org.apache.spark.sql.types.StructField("__t",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val h = graft.functions.TextFunctions.portableHash(
      concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    input.join(broadcast(tdf), Seq(groupCol))
      .where(h < col("__t"))
      .drop("__t")
  }

  /** The per-group integer hash thresholds backing [[temperatureMix]]:
    * target share p_s ∝ n_s^alpha; output size M = min_s n_s/p_s (the
    * largest corpus the target composition admits); keep rate
    * r_s = M·p_s/n_s, mapped to floor(r_s·2^60). The binding group's
    * threshold is exactly 2^60 (kept whole). */
  def temperatureThresholds(counts: Map[String, Long],
      alpha: Double): Map[String, Long] = {
    require(counts.nonEmpty, "need at least one group")
    require(counts.values.forall(_ > 0), "group counts must be positive")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val pow = counts.map { case (g, n) => (g, math.pow(n.toDouble, alpha)) }
    val z = pow.values.sum
    // M = min_s n_s/p_s = z * min_s n_s^(1-alpha); the argmin group is
    // the BINDING one — pinned to keep-rate exactly 1.0 rather than the
    // 1-ε float residue of m·(pow/z)/n (x/y·y ≠ x in IEEE)
    val ratios = counts.map { case (g, n) => (g, n.toDouble / (pow(g) / z)) }
    val binding = ratios.minBy { case (g, v) => (v, g) }._1
    val m = ratios(binding)
    val span = BigDecimal(2).pow(60)
    counts.map { case (g, n) =>
      val r = if (g == binding) 1.0
        else math.min(1.0, m * (pow(g) / z) / n.toDouble)
      (g, (BigDecimal(r) * span).setScale(0, BigDecimal.RoundingMode.FLOOR)
        .toLong)
    }
  }

  /** EXPLICIT-target corpus mixing ("make the mix 50% en, 20% es, 20%
    * de, 10% fr"): thin each group so the output composition matches
    * the caller's target weights in expectation, keeping the BINDING
    * group — the one the targets exhaust first — whole, which yields
    * the LARGEST corpus the target composition admits. The static-
    * reweighting counterpart (The Pile / DoReMi-style fixed mixture
    * weights) of [[temperatureMix]]'s power-law flattening: there the
    * target shares derive from the observed counts (p_s ∝ n_s^α), here
    * the caller dictates them outright.
    *
    * Groups absent from `weights` (or weighted 0) are DROPPED — a mix
    * is a contract, not a suggestion; a weighted group absent from the
    * data fails loud (the target composition is unattainable without
    * it). Selection is the same engine-portable deterministic hash
    * walk as [[temperatureMix]] against per-group integer thresholds
    * (membership a pure function of (id, seed)); the keep filter is
    * MAP-SIDE — one broadcast threshold join plus a comparison, no
    * shuffle of the corpus, so the plan scales to any corpus size.
    * Thinning is Bernoulli (expected counts, not exact) — compose
    * [[quotaPerGroup]] when exact per-group counts matter.
    *
    * Every number in [[mixtureThresholds]] is plain IEEE arithmetic in
    * a pinned evaluation order (z summed in sorted-key order, ratio
    * n/(w/z), binding by (ratio, group) min, keep rate m·(w/z)/n,
    * threshold floor(r·2⁶⁰) — exact because scaling a double by 2⁶⁰
    * only shifts its exponent), so an external engine re-derives the
    * thresholds from the observed counts and the weight literals alone
    * — no fitted side table, full replay. */
  def mixtureSelect(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], seed: Long = 42L): DataFrame = {
    val input = graft.core.CacheScope.retainInput(df)
    val counts = input.groupBy(groupCol).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.get(0), r.getLong(1))).toMap
    require(!counts.contains(null),
      s"mixtureSelect: null values in group column '$groupCol' — coalesce them first")
    require(counts.keys.map(_.toString).toSet.size == counts.size,
      s"mixtureSelect: distinct '$groupCol' values collide on toString")
    val ts = mixtureThresholds(
      counts.map { case (g, n) => (g.toString, n) }, weights)
    val spark = df.sparkSession
    val gField = input.schema(groupCol)
    import scala.jdk.CollectionConverters._
    // only weighted groups ride in the threshold table; the inner join
    // below drops unweighted groups with zero per-row work
    val keep = counts.keys.filter(g => ts.contains(g.toString)).toSeq
    val tdf = spark.createDataFrame(
      keep.map(g => org.apache.spark.sql.Row(g, ts(g.toString))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        gField.copy(nullable = false),
        org.apache.spark.sql.types.StructField("__t",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val h = graft.functions.TextFunctions.portableHash(
      concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    input.join(broadcast(tdf), Seq(groupCol))
      .where(h < col("__t"))
      .drop("__t")
  }

  /** Epoch-aware corpus mixing — the UPSAMPLING counterpart of
    * [[mixtureSelect]]. A static mix that only thins cannot express the
    * published LLM recipes: GPT-3 (Brown et al. 2020, table 2.2) runs
    * Wikipedia for 3.4 epochs while Common Crawl sees 0.44; repeating
    * small high-quality sources is the standard lever, bounded in value
    * around ~4 epochs (Muennighoff et al. 2023). Here each group `g`
    * with target `e_g` epochs emits `floor(e_g)` full copies of every
    * row plus one further copy kept per-row with probability
    * `frac(e_g)` — so the group's expected output mass is exactly
    * `e_g · n_g`. Groups absent from `epochs` are DROPPED (a mix is a
    * contract — the [[mixtureSelect]] rule); targeted groups absent
    * from the data fail loud.
    *
    * The output gains `epochCol` (0-based copy index), making
    * `(id, epoch)` the unique row key downstream (packing,
    * [[deterministicShuffle]] — seed the shuffle key with BOTH so
    * repeated copies land apart in training order). The fractional
    * copy is the engine-portable deterministic hash walk over
    * `id:epoch:seed` against `floor(frac·2⁶⁰)` ([[temperatureMix]]
    * discipline) — membership is a pure function of (id, epoch, seed),
    * replayable in SQL with no fitted side table.
    *
    * Shape at 100 TB: one broadcast join of a groups-sized table, one
    * map-side `explode(sequence(0, full))` (row multiplication
    * proportional to the requested epochs — the intended output size),
    * one codegen'd hash comparison. No shuffle of the corpus. */
  def epochMix(df: DataFrame, groupCol: String, idCol: String,
      epochs: Map[String, Double], seed: Long = 42L,
      epochCol: String = "epoch"): DataFrame = {
    require(epochs.nonEmpty, "epochMix: need at least one epoch target")
    require(epochs.values.forall(e => e > 0 && !e.isNaN && !e.isInfinite),
      s"epochMix: epochs must be finite and positive, got $epochs")
    require(!df.columns.contains(epochCol),
      s"epochMix: output column '$epochCol' already exists in the input")
    val input = graft.core.CacheScope.retainInput(df)
    val present = input.select(groupCol).distinct().collect()
      .map(_.get(0)).toSeq
    require(!present.contains(null),
      s"epochMix: null values in group column '$groupCol' — coalesce them first")
    require(present.map(_.toString).toSet.size == present.size,
      s"epochMix: distinct '$groupCol' values collide on toString")
    val missing = epochs.keySet.diff(present.map(_.toString).toSet)
    require(missing.isEmpty,
      s"epochMix: targeted groups absent from the data: " +
        s"${missing.toSeq.sorted.mkString(", ")}")
    val span = BigDecimal(2).pow(60)
    val spark = df.sparkSession
    val gField = input.schema(groupCol)
    import scala.jdk.CollectionConverters._
    val tdf = spark.createDataFrame(
      present.filter(g => epochs.contains(g.toString)).map { g =>
        val e = epochs(g.toString)
        val full = math.floor(e).toLong
        // frac in pinned IEEE order (e - floor(e)); threshold exact —
        // scaling a double by 2^60 only shifts its exponent
        val t = (BigDecimal(e - full) * span)
          .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        org.apache.spark.sql.Row(g, full, t)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        gField.copy(nullable = false),
        org.apache.spark.sql.types.StructField("__full",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__t",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val h = graft.functions.TextFunctions.portableHash(
      concat_ws(":", col(idCol).cast("string"),
        col(epochCol).cast("string"), lit(seed.toString)))
    input.join(broadcast(tdf), Seq(groupCol))
      .withColumn(epochCol, explode(sequence(lit(0L), col("__full"))))
      .where(col(epochCol) < col("__full") || h < col("__t"))
      .drop("__full", "__t")
  }

  /** The per-group integer hash thresholds backing [[mixtureSelect]]:
    * target share p_s = w_s/Σw (Σ in sorted-key order), output size
    * M = min_s n_s/p_s (the largest corpus the composition admits,
    * min by (value, group)), keep rate r_s = min(1, M·p_s/n_s) mapped
    * to floor(r_s·2⁶⁰); the binding group's threshold is exactly 2⁶⁰
    * (kept whole). Zero-weight groups are omitted (dropped rows);
    * weighted groups missing from `counts` fail loud. */
  def mixtureThresholds(counts: Map[String, Long],
      weights: Map[String, Double]): Map[String, Long] = {
    require(weights.nonEmpty, "need at least one target weight")
    require(weights.values.forall(w => w >= 0 && !w.isNaN && !w.isInfinite),
      "weights must be finite and non-negative")
    val wpos = weights.filter(_._2 > 0)
    require(wpos.nonEmpty, "need at least one positive target weight")
    val missing = wpos.keySet.diff(counts.keySet)
    require(missing.isEmpty,
      s"mixtureSelect: weighted groups absent from the data " +
        s"(target composition unattainable): ${missing.toSeq.sorted.mkString(", ")}")
    require(counts.values.forall(_ > 0), "group counts must be positive")
    val z = wpos.toSeq.sortBy(_._1).map(_._2).sum
    val ratios = wpos.map { case (g, w) =>
      (g, counts(g).toDouble / (w / z))
    }
    val binding = ratios.minBy { case (g, v) => (v, g) }._1
    val m = ratios(binding)
    val span = BigDecimal(2).pow(60)
    wpos.map { case (g, w) =>
      val r = if (g == binding) 1.0
        else math.min(1.0, m * (w / z) / counts(g).toDouble)
      (g, (BigDecimal(r) * span).setScale(0, BigDecimal.RoundingMode.FLOOR)
        .toLong)
    }
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): pick the `k` raw documents
    * whose hashed-unigram distribution best resembles a TARGET corpus.
    * The published recipe — hash every token into one of `buckets`
    * buckets, fit Laplace-smoothed bucket distributions p (target) and
    * q (raw), score each raw doc by its importance log-weight
    * Σ_tokens log(p_b/q_b), keep the top-k — with the selection made
    * deterministic (rank by weight, ties by id) rather than
    * Gumbel-perturbed, so reruns and engines agree.
    *
    * The fitted model is the integer table [[dsirLogRatios]] returns:
    * per-bucket log-ratios QUANTIZED to dyadic rationals
    * m_b = floor(2²⁰·(ln p_b − ln q_b)), so a document's log-weight is
    * the EXACT integer Σ m_{b(t)} (scaled by 2⁻²⁰ — a power of two, so
    * the double `log_weight` column is exact too). Scoring is one
    * codegen'd map-side fold per doc against a 64-entry literal map —
    * no shuffle, no join; ranking is TakeOrdered (per-partition heap).
    * The fit is two single-pass aggregates that reduce to ≤ `buckets`
    * rows each. Nothing here grows with corpus size except the scans.
    *
    * Null-text docs score null and are excluded from the ranking (the
    * null-drop convention of every quality gate). Output: the selected
    * raw rows plus `log_weight`, ordered by (weight desc, id). */
  def dsirSelect(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, k: Int, buckets: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    val m = dsirLogRatios(raw, target, textCol, buckets)
    dsirScore(raw, textCol, m)
      .where(col("__wnum").isNotNull)
      .orderBy(col("__wnum").desc, col(idCol))
      .limit(k)
      .withColumn("log_weight",
        col("__wnum").cast("double") / lit(1048576.0d))
      .drop("__wnum")
  }

  /** The fitted DSIR model: for each of `buckets` hashed-token buckets,
    * the quantized log-ratio m_b = floor(2²⁰·(ln((t_b+1)/(T+B)) −
    * ln((r_b+1)/(R+B)))) of Laplace-smoothed target vs raw unigram
    * probabilities. Tokens are the canonical normalized stream
    * (lowercase, punctuation collapsed) hashed by the engine-portable
    * md5 walk, so an external engine reproduces every bucket count;
    * the ln calls are the ONE non-replayable step (last-ulp
    * engine-specific), which the quantization freezes into plain
    * integers — the same embed-the-fit oracle boundary as
    * temperatureMix's pow. Every bucket gets an entry (smoothing covers
    * empty ones), so scoring lookups never miss. */
  def dsirLogRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int = 64): Map[Int, Long] = {
    require(buckets > 0, "buckets must be positive")
    def bucketCounts(df: DataFrame): Map[Int, Long] =
      df.select(explode(graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.normalizeText(col(textCol)))).as("__t"))
        .select(pmod(graft.functions.TextFunctions.portableHash(col("__t")),
          lit(buckets.toLong)).cast("int").as("__b"))
        .groupBy("__b").agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val rc = bucketCounts(raw)
    val tc = bucketCounts(target)
    val rTot = rc.values.sum.toDouble + buckets
    val tTot = tc.values.sum.toDouble + buckets
    (0 until buckets).map { b =>
      val lr = math.log((tc.getOrElse(b, 0L) + 1L).toDouble / tTot) -
        math.log((rc.getOrElse(b, 0L) + 1L).toDouble / rTot)
      (b, math.floor(lr * 1048576.0d).toLong)
    }.toMap
  }

  /** Map-side DSIR scoring: appends `__wnum` = Σ_tokens m_{bucket(t)}
    * (exact integer; null text → null) against a literal bucket→m map.
    * Exposed separately so a fitted model can score fresh batches
    * (streaming ingestion) without refitting. */
  def dsirScore(df: DataFrame, textCol: String,
      logRatios: Map[Int, Long]): DataFrame = {
    require(logRatios.nonEmpty, "empty model")
    val buckets = logRatios.size
    require((0 until buckets).forall(logRatios.contains),
      s"model must cover buckets 0 until $buckets")
    val mcol = map_from_arrays(
      array((0 until buckets).map(b => lit(b)): _*),
      array((0 until buckets).map(b => lit(logRatios(b))): _*))
    val toks = graft.functions.TextFunctions.tokens(
      graft.functions.TextFunctions.normalizeText(col(textCol)))
    df.withColumn("__wnum",
      aggregate(toks, lit(0L), (acc, t) => acc +
        element_at(mcol, pmod(graft.functions.TextFunctions.portableHash(t),
          lit(buckets.toLong)).cast("int"))))
  }

  /** Deterministic weighted sample without replacement of exactly
    * min(k, n) rows (Efraimidis–Spirakis A-ES): each row draws
    * u = (portableHash(id:seed) + 1) / (2⁶⁰ + 1) ∈ (0, 1] and ranks by
    * key = u^(1/w) — equivalently ln(u)/w, computed in log space for
    * stability — taking the k largest. Inclusion probability rises with
    * weight exactly as weighted sampling without replacement demands,
    * and membership is a pure function of (id, seed, weight):
    * reproducible across runs and engines (the md5-based hash is the
    * [[hashSplit]] portability story).
    *
    * Scale shape: one map-side key computation + one TakeOrdered(k) —
    * no full sort, no shuffle of the data, driver memory k rows of
    * (key, id). Ties in key are measure-zero (continuous keys); the id
    * tiebreak pins determinism anyway. */
  def weightedReservoir(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (graft.functions.TextFunctions.portableHash(
      concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
      .cast("double") + 1.0) / (math.pow(2.0, 60.0) + 1.0)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Deterministic global training order: every row ranked by the
    * engine-portable keyed hash of its id (md5 hex of "id:seed", ties
    * impossible for unique ids since the tiebreak is the id itself).
    * The order is a pure function of (ids, seed) — independent of
    * partitioning, parallelism, and engine — so the same corpus always
    * trains in the same order, a DuckDB `ROW_NUMBER() OVER (ORDER BY
    * md5(...), id)` replays it exactly, and appending documents never
    * perturbs the relative order of existing ones.
    *
    * Scale shape: a global `row_number()` window is the classic
    * single-partition trap (WindowExec with no PARTITION BY moves
    * EVERYTHING to one task). This implementation computes the dense
    * global rank distributively: range-repartition on the hash (the
    * TeraSort shape — each partition owns a contiguous hash range),
    * sort within partitions, count rows per partition (a tiny
    * nPartitions-row collect), broadcast the prefix-sum offsets, and
    * add each partition's offset to its local row_number. Where the
    * rank itself is not needed downstream, consumers can skip the
    * window entirely and just write the range-sorted output. */
  /** Curriculum ordering (Bengio et al. 2009 applied to corpus prep):
    * cut a difficulty score into `nBands` equal-frequency bands
    * (band 0 = lowest score, served first) and emit ONE global serving
    * order that walks the bands in sequence with a deterministic
    * seeded shuffle INSIDE each band — "easy first, random within
    * difficulty" as a pure function of (ids, scores, seed).
    *
    * Scale shape: band cuts are one percentile aggregate (exact under
    * the cutoff, approx above — the shared rule); the global order is
    * the [[deterministicShuffle]] two-phase rank generalized to a
    * (band, hash, id) key — range-repartition, per-partition counts to
    * broadcast prefix offsets, per-partition windows. No
    * single-partition stage at any size. */
  def curriculumOrder(df: DataFrame, scoreCol: String, idCol: String,
      nBands: Int = 4, seed: Long = 42L, outCol: String = "curriculum_order",
      numPartitions: Int = 0): DataFrame = {
    require(nBands >= 1, "curriculumOrder: nBands must be >= 1")
    import graft.functions.Normalization.ExactPercentileCutoff
    val cached = graft.core.CacheScope.retainInput(df)
    val cuts: Seq[Double] =
      if (nBands == 1) Seq.empty
      else {
        val exact = cached.count() <= ExactPercentileCutoff
        val cutPs = (1 until nBands).map(_.toDouble / nBands)
        cached.agg(
          (if (exact) percentile(col(scoreCol).cast("double"), typedlit(cutPs))
           else percentile_approx(col(scoreCol).cast("double"), typedlit(cutPs),
             lit(100000))).as("c"))
          .collect()(0).getSeq[Double](0)
      }
    val band = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(scoreCol).cast("double") > lit(c), 1).otherwise(0)
    }
    val h = md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = cached.withColumn("__band", band).withColumn("__h", h)
      .repartitionByRange(n, col("__band"), col("__h"), col(idCol))
      .sortWithinPartitions(col("__band"), col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val r = graft.core.CacheScope.retain(ranged)
    val counts = r.groupBy("__pid").count().collect()
      .map(x => (x.getInt(0), x.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; pid -> off }
    val offCol = coalesce(
      element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("__pid")),
      lit(0L))
    val w = Window.partitionBy("__pid")
      .orderBy(col("__band"), col("__h"), col(idCol))
    r.withColumn(outCol, row_number().over(w).cast("long") + offCol)
      .withColumnRenamed("__band", "band")
      .drop("__h", "__pid")
  }

  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
      outCol: String = "shuffle_rank", numPartitions: Int = 0): DataFrame = {
    val h = md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("__h", h)
      .repartitionByRange(n, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val cached = graft.core.CacheScope.retain(ranged)
    // tiny: one row per partition; prefix sums become broadcast offsets
    val counts = cached.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val off = acc; acc += c; pid -> off
    }
    val offCol = coalesce(
      element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("__pid")),
      lit(0L))
    // per-partition window: distributed, no single-partition stage
    val w = Window.partitionBy("__pid").orderBy(col("__h"), col(idCol))
    cached.withColumn(outCol, (row_number().over(w).cast("long") + offCol))
      .drop("__h", "__pid")
  }

  /** Deterministic token-budget selection: walk the corpus in
    * [[deterministicShuffle]] order and keep every document whose
    * RUNNING token total (including itself) stays within `budget` —
    * "fill a 1T-token training mix" as a pure function of
    * (ids, weights, seed, budget). The walk order is the keyed hash
    * order, so it is append-stable — new documents interleave without
    * permuting the relative order of existing ones (the selection
    * itself shifts as insertions consume budget earlier in the walk) —
    * and the same corpus always yields the same mix on any engine
    * (DuckDB replays it with one windowed SUM over the same md5 keys).
    *
    * Scale shape: the global running sum uses the same two-phase trick
    * as [[deterministicShuffle]] — range-repartition on the hash, ONE
    * per-partition aggregate (nPartitions rows to the driver), broadcast
    * prefix-sum offsets, then a per-partition window adds each
    * partition's offset to its local running sum. Partitions whose
    * offset already exceeds the budget are filtered out BEFORE the
    * window runs (weights are required non-negative, so their every row
    * is over budget) — at 100 TB with a 1%-of-corpus budget that prunes
    * ~99% of the windowing work. Output: input columns + `running_total`
    * (the inclusive running sum that justified keeping the row).
    * Weights must be non-negative and non-null. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, seed: Long = 42L, numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val h = md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("__h", h)
      .repartitionByRange(n, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val cached = graft.core.CacheScope.retain(ranged)
    val sums = cached.groupBy("__pid")
      .agg(sum(col(weightCol).cast("long")).as("__s")).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) =>
      val off = acc; acc += s; pid -> off
    }
    val offCol = coalesce(
      element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("__pid")),
      lit(0L))
    val w = Window.partitionBy("__pid").orderBy(col("__h"), col(idCol))
    cached
      .where(offCol <= budget) // whole-partition prune (non-negative weights)
      .withColumn("running_total",
        sum(col(weightCol).cast("long")).over(w) + offCol)
      .where(col("running_total") <= budget)
      .drop("__h", "__pid")
  }

  /** Per-group token budgets — [[tokenBudgetSelect]] with the running
    * sum computed inside each group (source / domain / language): "at
    * most N tokens per domain", the budget-denominated counterpart of
    * [[quotaPerGroup]]'s doc-count caps. `overrides` pins specific
    * groups to their own budgets; everything else gets `budget`.
    *
    * Scale shape: the naive `SUM OVER (PARTITION BY group ORDER BY
    * hash)` sorts a whole group in one task — a billion-row domain
    * dies. This generalizes the two-phase prefix sum per group:
    * range-repartition on (group, hash) so each task owns a contiguous
    * slice of one-or-more groups, aggregate one (partition, group) sum
    * row per slice (small collect: ≤ partitions × groups-touched),
    * broadcast per-group prefix offsets, and window per (partition,
    * group). Slices whose group offset already exceeds the group budget
    * are pruned before the window. Weights non-negative/non-null;
    * groups non-null. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, budget: Long,
      overrides: Map[String, Long] = Map.empty,
      seed: Long = 42L, numPartitions: Int = 0): DataFrame = {
    require(budget >= 0 && overrides.values.forall(_ >= 0),
      "budgets must be non-negative")
    val h = md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("__h", h)
      .repartitionByRange(n, col(groupCol), col("__h"), col(idCol))
      .sortWithinPartitions(col(groupCol), col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val cached = graft.core.CacheScope.retain(ranged)
    val sums = cached.groupBy(col("__pid"), col(groupCol).cast("string").as("__g"))
      .agg(sum(col(weightCol).cast("long")).as("__s")).collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
    // a null group would fall out of the concat_ws offset key below and
    // silently read offset 0; reject it like quotaPerGroup does
    require(!sums.exists(_._2 == null),
      s"tokenBudgetPerGroup: null values in group column '$groupCol' — coalesce them first")
    val offsets: Seq[((Int, String), Long)] = sums.groupBy(_._2).toSeq
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, s) =>
          val off = acc; acc += s; (pid, g) -> off
        }
      }
    val sep = "\u0001" // unit separator: cannot appear in a decimal pid
    val keyCol = concat_ws(sep, col("__pid").cast("string"),
      col(groupCol).cast("string"))
    val offCol = coalesce(
      element_at(
        map(offsets.flatMap { case ((p, g), o) =>
          Seq(lit(s"$p$sep$g"), lit(o)) }: _*),
        keyCol),
      lit(0L))
    val budgetCol =
      if (overrides.isEmpty) lit(budget)
      else coalesce(
        element_at(
          map(overrides.toSeq.flatMap { case (g, b) =>
            Seq(lit(g), lit(b)) }: _*),
          col(groupCol).cast("string")),
        lit(budget))
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(col("__h"), col(idCol))
    cached
      .where(offCol <= budgetCol) // per-(slice, group) prune
      .withColumn("running_total",
        sum(col(weightCol).cast("long")).over(w) + offCol)
      .where(col("running_total") <= budgetCol)
      .drop("__h", "__pid")
  }

  /** Mix audit — the before/after composition report for ANY mixing or
    * sampling stage ([[mixtureSelect]], [[temperatureMix]],
    * [[epochMix]], [[quotaPerGroup]], token budgets, …): one row per
    * group present in EITHER frame with doc counts, optional token
    * sums, 4-decimal corpus shares on each side, and the count ratio —
    * the numbers a data card publishes next to "we reweighted X".
    * Groups the stage dropped show `n_after = 0`; groups it
    * synthesized (epoch copies change nothing here — same group) show
    * `n_before = 0`. Shares divide by the full frame totals (0 when a
    * side is empty), everything else exact integers. Two partial-
    * aggregated rollups + a groups-sized outer join — nothing corpus-
    * sized survives the aggregates. */
  def mixReport(before: DataFrame, after: DataFrame, groupCol: String,
      weightCol: Option[String] = None): DataFrame = {
    def rollup(df: DataFrame, suffix: String): DataFrame = {
      val base = df.groupBy(col(groupCol))
        .agg(count(lit(1)).as(s"n_$suffix"))
      weightCol.fold(base) { w =>
        df.groupBy(col(groupCol))
          .agg(count(lit(1)).as(s"n_$suffix"),
            sum(col(w).cast("long")).as(s"${w}_$suffix"))
      }
    }
    val b = rollup(before, "before")
    val a = rollup(after, "after")
    val joined = b.join(a, Seq(groupCol), "full_outer")
    val totalB = sum(coalesce(col("n_before"), lit(0L)))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    val totalA = sum(coalesce(col("n_after"), lit(0L)))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    def share(n: Column, total: Column): Column =
      when(total === 0, lit(0.0)).otherwise(
        floor(n.cast("double") / total.cast("double") * 1e4 + 0.5) / 1e4)
    joined
      .withColumn("n_before", coalesce(col("n_before"), lit(0L)))
      .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
      .withColumn("share_before", share(col("n_before"), totalB))
      .withColumn("share_after", share(col("n_after"), totalA))
      .withColumn("keep_ratio",
        when(col("n_before") === 0, lit(null).cast("double")).otherwise(
          floor(col("n_after").cast("double") /
            col("n_before").cast("double") * 1e4 + 0.5) / 1e4))
  }

  /** The integer cut points backing [[hashSplit]] — exposed so an
    * external verifier can embed the EXACT same literals. */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    val span = BigDecimal(2).pow(60)
    val cum = fractions.scanLeft(BigDecimal(0)) { case (acc, (_, f)) =>
      acc + BigDecimal(f)
    }.tail
    fractions.map(_._1).zip(cum.map(c => (c * span).setScale(0,
      BigDecimal.RoundingMode.FLOOR).toLong))
  }
}
