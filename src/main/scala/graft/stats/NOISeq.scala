package graft.stats

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** NOISeq differential expression (reference SURVEY.md §2.5 D5;
  * src/mdataframe/differential.py:526-740; Tarazona et al. 2011).
  *
  * Semantics re-derived from the published method and pinned against the
  * reference's golden frame (tests/test_differential.py:301-309):
  *
  *  - data = the A∪B condition columns only (differential.py:668);
  *    zeros replaced by `k` (0.5);
  *  - normalization "tmm": pairwise trimmed-weighted-mean factors vs the
  *    FIRST data column (the old edgeR `.calcFactorWeighted`, trim 30% M /
  *    5% A), geometric-mean-normalized over the used columns, then each
  *    column rescaled to the arithmetic MEAN raw library size:
  *    `x/(lib_j·f_j) · mean(lib)` — this reproduces the reference's M, D
  *    and ranking to 1e-7;
  *  - per gene: M = log2(meanA/meanB), D = |meanA − meanB|,
  *    ranking = sign(M)·√(M²+D²);
  *  - noise distribution: within-condition replicate pairs (M*, D*) pooled
  *    over genes; without replicates, `nss` technical replicates are
  *    simulated per condition (library size pnr·L ± v, per-gene Poisson
  *    marginals of the multinomial, deterministic per-gene seeding so
  *    results are partitioning-independent — JVM RNG, so `Prob` is
  *    semantically faithful but not bit-identical to R's rmultinom);
  *  - Prob(g) = fraction of noise points with |M*| < |M_g| AND D* < D_g.
  *
  * Scale: normalization/statistics are map-side; the noise distribution is
  * collected (capped at `maxNoisePoints` with deterministic subsampling)
  * and broadcast; dominance counting uses chunked binary search, O(√N) per
  * gene instead of a full scan.
  */
final case class NOISeq(
    conditionA: String,
    conditionB: String,
    conditionToColumns: Map[String, Seq[String]],
    comparisonName: Option[String] = None,
    k: Double = 0.5,
    norm: String = "tmm",
    lc: Int = 0,
    pnr: Double = 0.2,
    nss: Int = 5,
    v: Double = 0.02,
    includeOtherColumnsForVariance: Boolean = false,
    seed: Long = 42L,
    maxNoisePoints: Int = 500000,
    index: String = "gene_stable_id",
    // ---- noiseqbio branch (differential.py:714-722; Tarazona et al.
    //      2015). Selected like the reference: replicates="biological"
    //      AND enough samples for within-condition variance (≥2 per
    //      condition here — the reference's `df_samples.size[1] < 3`
    //      guard is a pandas bug, `.size` is a scalar; this is its
    //      evident intent). ----
    replicates: String = "no",
    r: Int = 100,
    nclust: Int = 15,
    a0per: Double = 0.9,
    bins: Int = 0,
    // gene annotation for norm="rpkm" with lc != 0: (index, start, stop)
    // or (index, length); differential.py:628-639 __prepare_lengths
    lengths: Option[DataFrame] = None) extends Transformer {

  val name = "NOISeq"
  override def suffix: Option[String] =
    Some(comparisonName.fold(s" ($name)")(c => s" ($c)"))

  private val accepted = Seq("tmm", "rpkm", "uqua", "n")
  require(accepted.contains(norm),
    s"Only $accepted are accepted as values for norm, given was $norm")

  val columnsA: Seq[String] = conditionToColumns(conditionA)
  val columnsB: Seq[String] = conditionToColumns(conditionB)

  def logFCColumn: String = "logFC" + suffix.get
  def dColumn: String = "D" + suffix.get
  def probColumn: String = "Prob" + suffix.get
  def rankColumn: String = "Rank" + suffix.get
  def columns: Seq[String] = Seq(logFCColumn, dColumn, probColumn, rankColumn)

  def apply(df: DataFrame): DataFrame = {
    val dataCols = columnsA ++ columnsB
    // sinceros: zeros → k (differential.py: k parameter; NOISeq semantics)
    // cached: library sizes, the per-column TMM factors, the noise
    // collection and the final probability pass each trigger an action —
    // the (often expensive) upstream plan must not re-execute per action
    val zeroed = df.select(
      (col(index) +: dataCols.map(c =>
        when(col(c).cast("double") === 0.0, lit(k))
          .otherwise(col(c).cast("double")).as(c))): _*)
      .pipe(graft.core.CacheScope.retain)

    // per-column scale factors
    val lib = graft.functions.Normalization.libSizes(zeroed, dataCols)
    val meanLib = dataCols.map(lib).sum / dataCols.size
    // one cheap count on the cached frame drives every pairFactor's
    // exact-vs-approx switch instead of a count job per sample column
    lazy val nGenes = zeroed.count()
    val scales: Map[String, Double] = norm match {
      case "tmm" =>
        val raw = dataCols.map { c =>
          c -> Tmm2.pairFactor(zeroed, c, dataCols.head, lib(c), lib(dataCols.head),
            nRows = Some(nGenes))
        }.toMap
        val gm = math.exp(raw.values.map(math.log).sum / raw.size)
        dataCols.map(c => c -> meanLib / (lib(c) * raw(c) / gm)).toMap
      case "uqua" =>
        val uq = upperQuartiles(zeroed, dataCols)
        val gm = math.exp(dataCols.map(c => math.log(uq(c))).sum / dataCols.size)
        dataCols.map(c => c -> meanLib / (lib(c) * uq(c) / gm)).toMap
      case _ => // "n" (and "rpkm" without length correction when lc=0)
        dataCols.map(c => c -> meanLib / lib(c)).toMap
    }

    val colScaled = zeroed.select(
      (col(index) +: dataCols.map(c => (col(c) * lit(scales(c))).as(c))): _*)

    // rpkm length correction (differential.py:628-639; NOISeq's lc
    // exponent semantics: lc=0 means NO length correction — the row
    // factor is (length/1000)^lc, so it only engages when lc != 0).
    // The annotation join is broadcast: the gene-length table is the
    // small side of a 100 TB count matrix only when genes << rows; a
    // gene axis IS the row axis here, so both sides are the same size —
    // Spark's planner picks sort-merge above the broadcast threshold on
    // its own, nothing to force.
    val normed = if (norm == "rpkm" && lc != 0) {
      val lt = lengths.getOrElse(throw new IllegalArgumentException(
        "norm=rpkm with lc != 0 needs the gene-length annotation " +
          "(lengths = DataFrame with (index, length) or (index, start, stop))"))
      val lenCol =
        if (lt.columns.contains("length")) col("length").cast("double")
        else (col("stop").cast("double") - col("start").cast("double"))
      val lenDf = lt.select(col(index).as("__len_key"), lenCol.as("__len"))
      val joined = colScaled.join(lenDf, col(index) === col("__len_key"), "left")
      // fail loud on missing annotation instead of silently dropping or
      // mis-normalizing genes (QualityClassifier.fit precedent)
      val missing = joined.where(col("__len").isNull).count()
      require(missing == 0L,
        s"norm=rpkm: $missing genes have no length annotation")
      joined.select((col(index) +: dataCols.map(c =>
        (col(c) / pow(col("__len") / lit(1000.0), lit(lc.toDouble))).as(c))): _*)
    } else colScaled

    if (replicates == "biological" && math.min(columnsA.size, columnsB.size) >= 2)
      return noiseqbio(normed)

    val meanA = columnsA.map(col).reduce(_ + _) / columnsA.size
    val meanB = columnsB.map(col).reduce(_ + _) / columnsB.size
    val withMd = normed
      .withColumn("__m", log2(meanA / meanB))
      .withColumn("__d", abs(meanA - meanB))

    // ---- noise distribution ----
    val noise: Array[(Double, Double)] = {
      val realPairs = conditionToColumns.toSeq
        .filter { case (cond, _) =>
          cond == conditionA || cond == conditionB || includeOtherColumnsForVariance }
        .flatMap { case (_, cs0) =>
          val cs = cs0.filter(dataCols.contains)
          for (i <- cs.indices; j <- i + 1 until cs.size) yield (cs(i), cs(j))
        }
      if (realPairs.nonEmpty) collectNoise(withMd, realPairs)
      else {
        // no replicates: simulate nss technical replicates per condition,
        // materialized as named columns ONCE so the pair expressions stay
        // small (inlining each sim tree per pair breaks the 64KB codegen
        // method limit)
        var simDf = withMd
        val simPairs = Seq(conditionA, conditionB).flatMap { cond =>
          val c = conditionToColumns(cond).head
          val names = simulate(col(c), lib(c) * scales(c), cond).zipWithIndex.map {
            case (e, i) =>
              val n = s"__sim_${cond}_$i"
              simDf = simDf.withColumn(n, e)
              n
          }
          for (i <- names.indices; j <- i + 1 until names.size) yield (names(i), names(j))
        }
        collectNoise(simDf, simPairs)
      }
    }

    val probCol = NOISeq.dominanceProb(withMd.sparkSession, noise)
    val out = withMd
      .withColumn(logFCColumn, col("__m"))
      .withColumn(dColumn, col("__d"))
      .withColumn(probColumn, probCol(abs(col("__m")), col("__d")))
      .withColumn(rankColumn,
        signum(col("__m")) * sqrt(col("__m") * col("__m") + col("__d") * col("__d")))
    out.select((col(index) +: columns.map(col)): _*)
  }

  /** NOISeqBIO (differential.py:714-722 delegates to R `noiseqbio`;
    * Tarazona et al. 2015, NAR 43(21)): the biological-replicates branch.
    * Re-derived from the published method, deterministically:
    *
    *  - per gene, M = log2(x̄A/x̄B) and the signed D = x̄A − x̄B, each
    *    standardized by its standard error with a SAM-style `a0` offset
    *    (the `a0per` percentile of the pooled SEs): θ = (M* + D*)/2;
    *  - variance estimates are pooled across genes of similar expression
    *    (the paper's k-means clusters, here `nclust` equal-frequency
    *    expression buckets — deterministic and shuffle-free, same
    *    information-sharing purpose);
    *  - the null θ⁰ comes from balanced relabelings of the sample
    *    columns (the paper's label permutations; enumerated in lexical
    *    order and capped at `r` deterministically instead of RNG draws);
    *  - Prob = 1 − local-fdr à la Efron empirical Bayes:
    *    lfdr(z) = min(1, p0·f0(z)/f(z)) with f/f0 from add-one-smoothed
    *    fixed-width histograms over θ∪θ⁰ and p0 by central matching
    *    (p0 = min(1, 2·P(|θ| ≤ median|θ⁰|))).
    *
    * Every step is closed-form given the normalized matrix, so the
    * whole branch replays in ANSI SQL (the q_noiseq oracle pattern).
    *
    * Scale: all per-gene statistics (including every relabeling's — the
    * matrix is wide, one gene per row) are row-local map-side work; the
    * only aggregates are nclust-sized bucket rollups, percentile passes
    * and a `bins`-sized histogram, each constant-size regardless of
    * corpus size; pooled stats return via broadcast joins. */
  private def noiseqbio(normed0: DataFrame): DataFrame = {
    val spark = normed0.sparkSession
    val n1 = columnsA.size
    val n2 = columnsB.size
    val normed = graft.core.CacheScope.retain(normed0)
    val ln2sq = math.log(2.0) * math.log(2.0)

    def meanOf(cs: Seq[String]): Column = cs.map(col).reduce(_ + _) / cs.size
    def varOf(cs: Seq[String], m: Column): Column =
      cs.map(c => (col(c) - m) * (col(c) - m)).reduce(_ + _) / (cs.size - 1)
    // delta-method SE²s of M (log2 ratio of means) and D (difference of
    // means) from the within-condition sample variances
    def varM(v1: Column, m1: Column, v2: Column, m2: Column): Column =
      (v1 / (lit(n1.toDouble) * m1 * m1) + v2 / (lit(n2.toDouble) * m2 * m2)) / lit(ln2sq)
    def varD(v1: Column, v2: Column): Column =
      v1 / lit(n1.toDouble) + v2 / lit(n2.toDouble)

    val perms = NOISeq.balancedRelabelings(columnsA, columnsB, r)
    val pids = perms.indices

    // ---- per-gene row-local statistics: observed + every relabeling ----
    val m1 = meanOf(columnsA); val m2 = meanOf(columnsB)
    val v1 = varOf(columnsA, m1); val v2 = varOf(columnsB, m2)
    // expression bucket key: total normalized count is relabeling-
    // invariant by construction, so the variance-pooling structure is
    // identical under the null
    val dataCols = columnsA ++ columnsB
    val statCols = Seq(
      log(dataCols.map(col).reduce(_ + _)).as("__lt"),
      log2(m1 / m2).as("__m"), (m1 - m2).as("__dsig"),
      varM(v1, m1, v2, m2).as("__vm"), varD(v1, v2).as("__vd")) ++
      pids.flatMap { p =>
        val (pa, pb) = perms(p)
        val pm1 = meanOf(pa); val pm2 = meanOf(pb)
        val pv1 = varOf(pa, pm1); val pv2 = varOf(pb, pm2)
        Seq(log2(pm1 / pm2).as(s"__m$p"), (pm1 - pm2).as(s"__dsig$p"),
          varM(pv1, pm1, pv2, pm2).as(s"__vm$p"), varD(pv1, pv2).as(s"__vd$p"))
      }
    val stats = normed.select(col(index) +: statCols: _*)

    // ---- nclust equal-frequency buckets on log total expression ----
    lazy val exact = normed.count() <= graft.functions.Normalization.ExactPercentileCutoff
    import graft.functions.Normalization.scalablePercentile
    val cutPs = (1 until nclust).map(_.toDouble / nclust)
    // ONE percentile aggregate evaluating every cut from a single
    // buffer: n separate percentile aggs each pay the full per-row
    // update cost (measured 13 s cpu at 20k genes for 14 of them)
    val cuts: Seq[Double] = stats.agg(
      (if (exact) percentile(col("__lt"), typedlit(cutPs))
       else percentile_approx(col("__lt"), typedlit(cutPs), lit(100000))).as("c"))
      .collect()(0).getSeq[Double](0)
    val bucket = cuts.map(c => when(col("__lt") > lit(c), 1).otherwise(0))
      .reduce(_ + _)
    val bucketed = graft.core.CacheScope.retain(
      stats.withColumn("__bk", bucket))

    // pooled SE²s per bucket (observed + per-relabeling), broadcast back
    // decimal-exact sums: a double avg() is partition-order dependent at
    // the last ulp, which would leak into theta and the histogram bins
    // (the Tables.dsum rule — r9 ADVICE)
    def davg(c: Column): Column =
      graft.Tables.dsumWide(c, 12) / count(lit(1))
    val poolAggs = Seq(davg(col("__vm")).as("__pvm"), davg(col("__vd")).as("__pvd")) ++
      pids.flatMap(p => Seq(davg(col(s"__vm$p")).as(s"__pvm$p"),
        davg(col(s"__vd$p")).as(s"__pvd$p"))) :+ count(lit(1)).as("__cnt")
    val pools = graft.core.CacheScope.retain(
      bucketed.groupBy(col("__bk")).agg(poolAggs.head, poolAggs.tail: _*))
    val pooled = graft.core.CacheScope.retain(
      bucketed.drop((Seq("__vm", "__vd") ++
          pids.flatMap(p => Seq(s"__vm$p", s"__vd$p"))): _*)
        .join(broadcast(pools.drop("__cnt")), "__bk"))

    // ---- a0 offsets: the a0per percentile of the pooled SEs over
    //      GENES. The pooled column takes at most nclust distinct
    //      values, so the gene-axis percentile equals the FREQUENCY-
    //      WEIGHTED percentile over the nclust-row pools frame
    //      (bucket sizes as frequencies) — exact at ANY corpus size
    //      for the cost of a 15-row aggregate, where 38 exact
    //      percentile aggs over the joined gene frame measured 57 s
    //      cpu at 20k genes. ----
    val a0Aggs = Seq(
      percentile(sqrt(col("__pvm")), lit(a0per), col("__cnt")).as("am"),
      percentile(sqrt(col("__pvd")), lit(a0per), col("__cnt")).as("ad")) ++
      pids.flatMap(p => Seq(
        percentile(sqrt(col(s"__pvm$p")), lit(a0per), col("__cnt")).as(s"am$p"),
        percentile(sqrt(col(s"__pvd$p")), lit(a0per), col("__cnt")).as(s"ad$p")))
    val a0Row = pools.agg(a0Aggs.head, a0Aggs.tail: _*).collect()(0)
    def a0(nm: String): Double = a0Row.getAs[Double](nm)

    // θ for the observed labels and each relabeling (ANSI: the a0+SE
    // denominators are floored away from 0.0 — an all-constant bucket
    // under a 0.9-percentile of zeros would otherwise throw)
    def theta(m: Column, d: Column, pvm: Column, pvd: Column,
        am: Double, ad: Double): Column =
      (m / greatest(lit(am) + sqrt(pvm), lit(1e-300)) +
        d / greatest(lit(ad) + sqrt(pvd), lit(1e-300))) / 2
    val thetaCols = Seq(col(index), col("__m"), col("__dsig"),
      theta(col("__m"), col("__dsig"), col("__pvm"), col("__pvd"),
        a0("am"), a0("ad")).as("__t")) ++
      pids.map(p => theta(col(s"__m$p"), col(s"__dsig$p"),
        col(s"__pvm$p"), col(s"__pvd$p"), a0(s"am$p"), a0(s"ad$p")).as(s"__t$p"))
    val withTheta = graft.core.CacheScope.retain(pooled.select(thetaCols: _*))

    // ---- empirical-Bayes probability ----
    val nullCol = explode(array(pids.map(p => col(s"__t$p")): _*)).as("__t0")
    val nulls = graft.core.CacheScope.retain(withTheta.select(nullCol))
    val loHi = withTheta
      .agg(min(least(col("__t") +: pids.map(p => col(s"__t$p")): _*)).as("lo"),
        max(greatest(col("__t") +: pids.map(p => col(s"__t$p")): _*)).as("hi"),
        count(lit(1)).as("n"))
      .collect()(0)
    val lo = loHi.getDouble(0)
    // bins <= 0: Rice-rule default, so a 12-gene toy frame and a 100 TB
    // matrix both get sane density resolution; gates pin it explicitly
    val effBins =
      if (bins > 0) bins
      else math.max(5, math.ceil(2.0 * math.cbrt(loHi.getLong(2).toDouble)).toInt)
    val w = math.max((loHi.getDouble(1) - lo) / effBins, 1e-300)
    def binOf(c: Column): Column =
      least(lit(effBins - 1), floor((c - lit(lo)) / lit(w))).cast("int")
    val obsHist: Map[Int, Long] = withTheta.groupBy(binOf(col("__t")).as("b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nullHist: Map[Int, Long] = nulls.groupBy(binOf(col("__t0")).as("b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nObs = obsHist.values.sum.toDouble
    val nNull = nullHist.values.sum.toDouble
    // central matching for the null proportion: half the null mass sits
    // below median|θ⁰| by construction, so p0 = min(1, 2·P(|θ|≤med))
    val medAbs = nulls.agg(scalablePercentile(abs(col("__t0")), 0.5, exact).as("m"))
      .collect()(0).getDouble(0)
    val nBelow = withTheta.where(abs(col("__t")) <= lit(medAbs)).count()
    val p0 = math.min(1.0, 2.0 * nBelow / nObs)

    import spark.implicits._
    val densities = (0 until effBins).map { b =>
      (b, (obsHist.getOrElse(b, 0L) + 1.0) / (nObs + effBins),
        (nullHist.getOrElse(b, 0L) + 1.0) / (nNull + effBins))
    }.toDF("__b", "__f", "__f0")
    withTheta.withColumn("__b", binOf(col("__t")))
      .join(broadcast(densities), "__b")
      .select(col(index),
        col("__m").as(logFCColumn),
        abs(col("__dsig")).as(dColumn),
        (lit(1.0) - least(lit(1.0), lit(p0) * col("__f0") / col("__f"))).as(probColumn),
        (signum(col("__m")) *
          sqrt(col("__m") * col("__m") + col("__dsig") * col("__dsig"))).as(rankColumn))
  }

  /** Simulated replicate expressions for one single-sample condition:
    * per-gene Poisson(T_i · x/L) marginals, T_i = (pnr ± v)·L, with a
    * deterministic per-(gene,replicate) seed from the index column. */
  private def simulate(x: Column, l: Double, cond: String): Seq[Column] = {
    (0 until nss).map { i =>
      val u = new java.util.Random(seed + cond.hashCode * 1000003L + i).nextDouble()
      val total = (pnr + (2 * u - 1) * v) * l
      val lambda = x / lit(l) * lit(total)
      val seedCol = xxhash64(col(index), lit(cond), lit(i), lit(seed))
      // rescale simulated counts back to the data scale so D* is comparable
      val simCount = NOISeq.poissonUdf(lambda, seedCol)
      val scaleBack = lit(l / total)
      when(simCount === 0.0, lit(k)).otherwise(simCount) * scaleBack
    }
  }

  /** Collect the pooled (|M*|, D*) noise multiset (capped deterministically). */
  private def collectNoise(df: DataFrame, pairs: Seq[(String, String)]): Array[(Double, Double)] = {
    val structs = pairs.map { case (an, bn) =>
      val a = col(an); val b = col(bn)
      struct(abs(log2(a / b)).as("m"), abs(a - b).as("d"))
    }
    val long = df.select(explode(array(structs: _*)).as("e"))
      .select(col("e.m").as("m"), col("e.d").as("d"))
      .where(!isnan(col("m")))
    val capped =
      if (maxNoisePoints > 0)
        long.withColumn("__h", xxhash64(col("m"), col("d")))
          .orderBy("__h").limit(maxNoisePoints).drop("__h")
      else long
    capped.collect().map(r => (r.getDouble(0), r.getDouble(1)))
  }

  private def upperQuartiles(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    import graft.functions.Normalization.{scalablePercentile, ExactPercentileCutoff}
    // exact percentile buffers every value in one reduce task; switch to
    // the approx aggregate past the shared cutoff (df is cached upstream,
    // so the count is a cheap columnar pass)
    val exact = df.count() <= ExactPercentileCutoff
    val row = df.agg(
      scalablePercentile(col(cols.head), 0.75, exact).as(cols.head),
      cols.tail.map(c => scalablePercentile(col(c), 0.75, exact).as(c)): _*).collect()(0)
    cols.map(c => c -> row.getAs[Double](c)).toMap
  }
}

object NOISeq {
  /** All balanced relabelings of the sample columns (pseudo-A groups of
    * size |colsA| drawn from A∪B), lexical order, excluding the observed
    * labeling and its mirror; deterministically capped at `cap` by
    * hash-order subsampling (the maxNoisePoints pattern — no RNG, so the
    * null is partitioning- and run-independent). Shared by the engine
    * and the SparkEntry oracle generator so both enumerate the identical
    * null. */
  def balancedRelabelings(colsA: Seq[String], colsB: Seq[String],
      cap: Int): Seq[(Seq[String], Seq[String])] = {
    val all = colsA ++ colsB
    val obs = colsA.toSet
    val mirror = colsB.toSet
    val combos = all.combinations(colsA.size)
      .filter(c => { val s = c.toSet; s != obs && s != mirror })
      .toSeq
    val sel =
      if (combos.size <= cap) combos
      else combos.sortBy(c =>
        scala.util.hashing.MurmurHash3.stringHash(c.mkString(" "))).take(cap)
    sel.map(c => (c, all.filterNot(c.toSet)))
  }

  /** Poisson sampling expression with explicit per-row seed (Knuth for
    * small λ, normal approximation above 30 — adequate for count data). */
  val poissonUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (lambda: Double, seed: Long) =>
      val rng = new java.util.Random(seed)
      if (lambda <= 0) 0.0
      else if (lambda < 30) {
        val limit = math.exp(-lambda)
        var p = 1.0; var n = -1
        while (p > limit) { p *= rng.nextDouble(); n += 1 }
        n.toDouble
      } else math.max(0.0, math.round(lambda + math.sqrt(lambda) * rng.nextGaussian()).toDouble)
    }

  /** Broadcast 2-D dominance counter: prob(mcut, dcut) = fraction of noise
    * with |M*| < mcut AND D* < dcut. Noise sorted by |M*| in √N chunks,
    * each chunk's D* values sorted — full chunks binary-search, the
    * boundary chunk scans: O(√N log N) per row. */
  def dominanceProb(spark: org.apache.spark.sql.SparkSession,
      noise: Array[(Double, Double)]): (Column, Column) => Column = {
    val sorted = noise.sortBy(_._1)
    val ms = sorted.map(_._1)
    val n = ms.length
    val chunk = math.max(64, math.ceil(math.sqrt(n.toDouble)).toInt)
    val chunkSortedD: Array[Array[Double]] =
      sorted.grouped(chunk).map(_.map(_._2).sorted).toArray
    val rawD = sorted.map(_._2)
    val bc = spark.sparkContext.broadcast((ms, rawD, chunkSortedD, chunk, n))
    val f = udf { (mcut: Double, dcut: Double) =>
      val (bm, bd, chunks, cs, total) = bc.value
      if (total == 0) 0.0
      else {
        // prefix length: number of noise points with |M*| < mcut
        var lo = 0; var hi = total
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (bm(mid) < mcut) lo = mid + 1 else hi = mid
        }
        val len = lo
        var cnt = 0L
        val fullChunks = len / cs
        var ci = 0
        while (ci < fullChunks) {
          val arr = chunks(ci)
          var l2 = 0; var h2 = arr.length
          while (l2 < h2) {
            val mid = (l2 + h2) >>> 1
            if (arr(mid) < dcut) l2 = mid + 1 else h2 = mid
          }
          cnt += l2
          ci += 1
        }
        var i = fullChunks * cs
        while (i < len) { if (bd(i) < dcut) cnt += 1; i += 1 }
        cnt.toDouble / total
      }
    }
    (m, d) => f(m, d)
  }
}

/** The old-edgeR pairwise TMM factor NOISeq bundles (`.calcFactorWeighted`):
  * identical math to [[graft.functions.Normalization.tmmFactors]]'s exact
  * path but for a single (obs, ref) column pair and WITHOUT the
  * geometric-mean renormalization (the caller decides that). */
object Tmm2 {
  import org.apache.spark.sql.expressions.Window

  def pairFactor(df: DataFrame, obsCol: String, refCol: String,
      nO: Double, nR: Double,
      logratioTrim: Double = 0.3, sumTrim: Double = 0.05,
      doWeighting: Boolean = true,
      exactCutoff: Long = 2000000L,
      nRows: Option[Long] = None): Double = {
    if (obsCol == refCol) return 1.0
    val obs = col(obsCol).cast("double"); val rf = col(refCol).cast("double")
    // q/p carry the SAME order as m/a (log2 is monotone) but are pure
    // IEEE divisions/multiplications: the exact-rank path ranks on them
    // so tie groups form on exact rational structure. Ranking on the
    // log values is fragile — two mathematically-equal count ratios
    // reached through different arithmetic (e.g. 1/3 vs 3/9 of
    // differently-rounded normalized values) can sit one ulp apart, and
    // whether a transcendental log2 collapses or separates them is
    // implementation-defined, which reorders average ranks and shifts
    // the whole trimmed set (observed: a 1e-2 factor jump from one
    // split tie group on the sf0.01 replicate matrix).
    val base = df.select(
      ((obs / nO) / (rf / nR)).as("q"),
      ((obs / nO) * (rf / nR)).as("p"),
      log2((obs / nO) / (rf / nR)).as("m"),
      ((log2(obs / nO) + log2(rf / nR)) / 2).as("a"),
      ((lit(nO) - obs) / nO / obs + (lit(nR) - rf) / nR / rf).as("w"))
      .where(!isnan(col("m")) && !isnan(col("a")) &&
        col("m") =!= Double.PositiveInfinity && col("m") =!= Double.NegativeInfinity &&
        col("a") =!= Double.NegativeInfinity)
    // the exact-rank windows below are global-order (single-task sorts of
    // the whole genes axis); past the cutoff, trim by approximate
    // quantile cutoffs instead — same switch as Normalization.tmmFactors.
    // nRows lets a caller looping over sample columns count once instead
    // of once per pair.
    val res = if (nRows.getOrElse(df.count()) > exactCutoff) {
      val cuts = base.agg(
        percentile_approx(col("m"),
          array(lit(logratioTrim), lit(1 - logratioTrim)), lit(10000)).as("mc"),
        percentile_approx(col("a"),
          array(lit(sumTrim), lit(1 - sumTrim)), lit(10000)).as("ac")).collect()(0)
      // an empty M/A frame yields null quantiles — fall through to the
      // same documented 1.0 fallback the exact branch produces
      if (cuts.isNullAt(0) || cuts.isNullAt(1)) Array.empty[org.apache.spark.sql.Row]
      else {
        val mc = cuts.getSeq[Double](0); val ac = cuts.getSeq[Double](1)
        base.where(col("m") >= mc(0) && col("m") <= mc(1) &&
            col("a") >= ac(0) && col("a") <= ac(1))
          .agg((sum(col("m") / col("w")) / sum(lit(1.0) / col("w"))).as("fw"),
            avg(col("m")).as("fu"))
          .collect()
      }
    } else {
      val wAll = Window.partitionBy(lit(1))
      val ranked = base
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("rm", rank().over(Window.orderBy("q")) +
          (count(lit(1)).over(Window.partitionBy("q")) - 1) / 2.0)
        .withColumn("ra", rank().over(Window.orderBy("p")) +
          (count(lit(1)).over(Window.partitionBy("p")) - 1) / 2.0)
      val loL = floor(col("n") * logratioTrim) + 1
      val hiL = col("n") + 1 - loL
      val loS = floor(col("n") * sumTrim) + 1
      val hiS = col("n") + 1 - loS
      ranked
        .where(col("rm") >= loL && col("rm") <= hiL && col("ra") >= loS && col("ra") <= hiS)
        .agg((sum(col("m") / col("w")) / sum(lit(1.0) / col("w"))).as("fw"),
          avg(col("m")).as("fu"))
        .collect()
    }
    if (res.isEmpty || res(0).isNullAt(0)) 1.0
    else math.pow(2.0, if (doWeighting) res(0).getDouble(0) else res(0).getDouble(1))
  }
}
