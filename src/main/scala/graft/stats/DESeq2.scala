package graft.stats

import graft.core.Transformer
import graft.functions.BhFdr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DESeq2-style Wald differential expression (reference SURVEY.md §2.5
  * D2/D3; src/mdataframe/differential.py:153-404), implemented natively on
  * the published model (Love et al., Genome Biology 2014):
  *
  *   1. size factors: median-of-ratios (exact `percentile` aggregation over
  *      the distributed genes dimension — one pass);
  *   2. gene-wise dispersion: Cox-Reid adjusted profile-likelihood MLE,
  *      initialized from moments — row-local kernel ([[NbGlm]]);
  *   3. dispersion trend: parametric Gamma GLM `α(μ)=a₀+a₁/μ` with R-glm
  *      step-halving semantics and ratio-outlier exclusion, falling back to
  *      the mean-dispersion fit when the parametric fit fails;
  *   4. MAP shrinkage: normal prior on log α centered at the trend, prior
  *      variance `max(MAD²(log residuals) − trigamma((m−p)/2), 0.25)`;
  *      dispersion outliers (log residual > 2·MAD-σ) keep their gene-wise
  *      estimate;
  *   5. Wald test: log2-scale NB GLM (ridge 1e-6), SE from the observed
  *      information, p = 2·Φ(−|stat|), BH-adjusted `padj`.
  *
  * Shuffle profile: one aggregation for size factors, one row-local pass
  * for gene estimates, a driver-side trend fit over (baseMean, αgw) pairs
  * (capped deterministic sample at scale), one row-local pass for MAP+Wald,
  * and the global BH windows. Everything per-gene is map-side.
  *
  * Conformance vs the reference golden frame (tests/test_differential.py:
  * 110-118): baseMean exact (1e-5); given equal dispersions, logFC/lfcSE/
  * stat reproduce DESeq2 to 1e-6 (validated by inversion in DESeq2Spec);
  * the 4-gene fixture exercises a degenerate trend fit whose R fallback
  * path (locfit) is environment-specific, so absolute dispersion values on
  * that fixture differ — see DESeq2Spec for the exact/behavioral split.
  */
final case class DESeq2Unpaired(
    conditionA: String,
    conditionB: String,
    conditionToColumns: Map[String, Seq[String]],
    comparisonName: Option[String] = None,
    includeOtherColumnsForVariance: Boolean = false,
    maxDriverGenes: Int = 2000000,
    index: String = "gene_stable_id") extends Transformer {

  val name = "DESeq2Unpaired"
  override def suffix: Option[String] =
    Some(comparisonName.fold(s" ($name)")(c => s" ($c)"))

  val columnsA: Seq[String] = conditionToColumns(conditionA)
  val columnsB: Seq[String] = conditionToColumns(conditionB)
  /** Extra condition columns entering the design for variance estimation
    * (differential.py:333-348, D3). */
  private val otherGroups: Seq[(String, Seq[String])] =
    if (includeOtherColumnsForVariance)
      conditionToColumns.toSeq.filter { case (c, _) => c != conditionA && c != conditionB }
        .sortBy(_._1)
    else Nil

  def logFCColumn: String = "log2FC" + suffix.get
  def pColumn: String = "p" + suffix.get
  def fdrColumn: String = "FDR" + suffix.get
  def baseMeanColumn: String = "baseMean" + suffix.get
  def lfcSEColumn: String = "lfcSE" + suffix.get
  def statColumn: String = "stat" + suffix.get
  def columns: Seq[String] =
    Seq(logFCColumn, pColumn, fdrColumn, baseMeanColumn, lfcSEColumn, statColumn)

  def apply(df0: DataFrame): DataFrame = run(df0, keepFit = false)

  /** [[apply]] plus the per-gene final-fit internals as `__alpha`
    * (final dispersion after MAP/outlier handling) and `__beta0`
    * (fitted log2 intercept): given these, the SE / Wald-stat tail is
    * closed-form, so an external engine can replay it (the partial-
    * oracle pattern — the iterative fit itself stays spec-pinned). */
  def applyWithFit(df0: DataFrame): DataFrame = run(df0, keepFit = true)

  private def run(df0: DataFrame, keepFit: Boolean): DataFrame = {
    // read by the size-factor count/agg and again by the estimate pass —
    // cache so an expensive upstream plan executes once; the returned
    // plan reads it too, so bounded retention rather than scratch
    val df = graft.core.CacheScope.retainInput(df0)
    val samples: Seq[String] = columnsA ++ columnsB ++ otherGroups.flatMap(_._2)
    val nS = samples.length
    // design: intercept + condition-A indicator (+ one column per "other"
    // group level); contrast of interest = the A indicator (A vs B)
    val design: Array[Array[Double]] = samples.map { s =>
      val base = Array(1.0, if (columnsA.contains(s)) 1.0 else 0.0)
      base ++ otherGroups.map { case (_, cs) => if (cs.contains(s)) 1.0 else 0.0 }
    }.toArray

    // ---- 1. size factors (median-of-log-ratios, exact below cutoff) ----
    val sf = DESeq2Unpaired.sizeFactors(df, samples)

    val bcDesign = df.sparkSession.sparkContext.broadcast((design, sf))

    // ---- 2. gene-wise dispersion + baseMean (row-local) ----
    val geneEstUdf = udf { (ys: Seq[Double]) =>
      val (x, s) = bcDesign.value
      DESeq2Unpaired.geneEstimate(ys.toArray, s, x)
    }
    val countsArr = array(samples.map(c => col(c).cast("double")): _*)
    val withEst = df.withColumn("__est", geneEstUdf(countsArr))
      .withColumn("__baseMean", col("__est.baseMean"))
      .withColumn("__alphaGw", col("__est.alpha"))
      .drop("__est")
    // the returned Wald plan reads this cache; bounded retention
    graft.core.CacheScope.retain(withEst)

    // ---- 3. trend fit (driver, capped deterministic sample) ----
    val pairsDf = withEst.select(col("__baseMean"), col("__alphaGw"))
      .where(col("__alphaGw") > 100 * NbGlm.MinDisp && col("__baseMean") > 0)
    val pairs = pairsDf
      .withColumn("__h", xxhash64(col("__baseMean"), col("__alphaGw")))
      .orderBy("__h").limit(maxDriverGenes)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val trend = DESeq2Unpaired.parametricTrend(pairs)

    // ---- 4. prior variance from MAD of log residuals ----
    val logRes = pairs.map { case (bm, a) => math.log(a) - math.log(trend(bm)) }
    val madSd = DESeq2Unpaired.mad(logRes)
    val varLogDispEsts = madSd * madSd
    val m = nS; val p = design(0).length
    val priorVar =
      if (m > p) math.max(varLogDispEsts - Gamma.trigamma((m - p) / 2.0), 0.25) else 0.25

    // ---- 5. MAP + Wald (row-local) ----
    val bcTrend = df.sparkSession.sparkContext.broadcast(
      (trend.a0, trend.a1, trend.flat, priorVar, varLogDispEsts))
    val waldUdf = udf { (ys: Seq[Double], alphaGw: Double, baseMean: Double) =>
      val (x, s) = bcDesign.value
      val (a0, a1, flat, pv, vld) = bcTrend.value
      val tr = if (flat) a0 else a0 + a1 / math.max(baseMean, 1e-8)
      DESeq2Unpaired.mapAndWald(ys.toArray, s, x, alphaGw, tr, pv, vld)
    }
    val res = withEst
      .withColumn("__w", waldUdf(countsArr, col("__alphaGw"), col("__baseMean")))
      .withColumn(baseMeanColumn, col("__baseMean"))
      .withColumn(logFCColumn, col("__w.lfc"))
      .withColumn(lfcSEColumn, col("__w.se"))
      .withColumn(statColumn, col("__w.stat"))
      .withColumn(pColumn, col("__w.p"))
      .withColumn("__alpha", col("__w.alpha"))
      .withColumn("__beta0", col("__w.beta0"))
      .drop("__w", "__baseMean", "__alphaGw")

    // ---- 6. BH adjust → FDR ----
    val adjusted = BhFdr.adjust(res, pColumn, fdrColumn)
    val fitCols = if (keepFit) Seq(col("__alpha"), col("__beta0")) else Nil
    adjusted.select((col(index) +: columns.map(col)) ++ fitCols: _*)
  }
}

object DESeq2Unpaired {
  final case class GeneEst(baseMean: Double, alpha: Double)

  /** DESeq2 estimateSizeFactors: exp(median of log count/geometric-mean
    * ratios) per sample, over genes with finite log geometric mean.
    * (DESeq2 medians the LOG ratios, so an even gene count yields the
    * GEOMETRIC mean of the two middle ratios — exact `percentile` agg.) */
  /** Median-of-log-ratios size factors. Below `exactCutoff` rows the
    * median uses Spark's exact `percentile` (interpolated, matching R's
    * median() on the golden fixtures); beyond it, `percentile_approx`
    * with 1e-5 rank accuracy — the exact aggregate buffers EVERY value
    * in the final reduce task, which is a single-task memory wall at
    * scale, while at millions of genes neighboring order statistics are
    * numerically indistinguishable. */
  def sizeFactors(df: DataFrame, samples: Seq[String],
      exactCutoff: Long = 1000000L): Array[Double] = {
    val nS = samples.length
    val logGm = samples.map(c => log(col(c).cast("double"))).reduce(_ + _) / nS
    val ratios = df.select(samples.map(c =>
      (log(col(c).cast("double")) - logGm).as(c)) :+
      (!isnan(logGm) && logGm =!= Double.NegativeInfinity).as("__ok"): _*)
      .where(col("__ok"))
    val exact = df.count() <= exactCutoff
    def medCol(c: String): Column =
      if (exact) percentile(col(c), lit(0.5)).as(c)
      else percentile_approx(col(c), lit(0.5), lit(100000)).as(c)
    val sfRow = ratios.agg(
      medCol(samples.head), samples.tail.map(medCol): _*).collect()(0)
    samples.map(c => math.exp(sfRow.getAs[Double](c))).toArray
  }
  /** `alpha`/`beta0` carry the final-fit internals so a partial oracle
    * can replay the closed-form SE/stat tail externally (defaults keep
    * the LRT call site unchanged). */
  final case class WaldRes(lfc: Double, se: Double, stat: Double, p: Double,
      alpha: Double = 0.0, beta0: Double = 0.0)
  final case class Trend(a0: Double, a1: Double, flat: Boolean) {
    def apply(mu: Double): Double = if (flat) a0 else a0 + a1 / math.max(mu, 1e-8)
  }

  /** Gene-wise dispersion: moments/rough init (DESeq2 estimateDispersions-
    * GeneEst), one mu-fit + CR-MLE alternation. */
  def geneEstimate(y: Array[Double], sf: Array[Double], x: Array[Array[Double]]): GeneEst = {
    val n = y.length
    val normed = Array.tabulate(n)(i => y(i) / sf(i))
    val bm = normed.sum / n
    if (bm <= 0) return GeneEst(0.0, NbGlm.MinDisp)
    // moments estimate: (var - mean(1/sf)*mean) / mean^2
    val xim = sf.map(1.0 / _).sum / n
    val bv = { val mu = bm; normed.map(v => (v - mu) * (v - mu)).sum / (n - 1) }
    val moments = (bv - xim * bm) / (bm * bm)
    val init = math.min(10.0, math.max(NbGlm.MinDisp, if (moments.isNaN) 0.1 else moments))
    val f = NbGlm.fit(y, sf, x, init)
    val alpha = NbGlm.maximizeAlpha(y, f.mu, x)
    GeneEst(bm, alpha)
  }

  /** DESeq2 parametricDispersionFit: iterated Gamma GLM (identity link)
    * with R-glm deviance stopping + step halving and ratio-outlier
    * exclusion; falls back to the mean fit on failure. */
  def parametricTrend(pairs: Array[(Double, Double)]): Trend = {
    if (pairs.length < 3) return meanTrend(pairs)
    val means = pairs.map(_._1); val disps = pairs.map(_._2)
    var coefs = Array(0.1, 1.0)
    var outer = 0
    var done = false
    try {
      while (!done) {
        val pred = means.map(m => coefs(0) + coefs(1) / m)
        val good = pairs.indices.filter { i =>
          val r = disps(i) / pred(i); r > 1e-4 && r < 15
        }.toArray
        if (good.length < 2) return meanTrend(pairs)
        val gm = good.map(means); val gd = good.map(disps)
        val co = gammaGlmIdentity(gd, gm, coefs)
        val old = coefs; coefs = co
        if (coefs.exists(_ <= 0)) return meanTrend(pairs)
        val change = math.pow(math.log(coefs(0) / old(0)), 2) +
          math.pow(math.log(coefs(1) / old(1)), 2)
        if (change < 1e-6) done = true
        outer += 1
        if (outer > 10 && !done) return meanTrend(pairs)
      }
      Trend(coefs(0), coefs(1), flat = false)
    } catch { case _: Throwable => meanTrend(pairs) }
  }

  /** fitType="mean" fallback: flat trend at the mean gene-wise estimate. */
  def meanTrend(pairs: Array[(Double, Double)]): Trend = {
    val use = pairs.filter(_._2 > 10 * NbGlm.MinDisp)
    val v = if (use.isEmpty) 0.1 else use.map(_._2).sum / use.length
    Trend(v, 0.0, flat = true)
  }

  /** Gamma GLM, identity link, R glm.fit semantics (deviance convergence,
    * step halving, maxit 25). Model: y ~ c0 + c1/x. */
  def gammaGlmIdentity(y: Array[Double], xs: Array[Double], start: Array[Double]): Array[Double] = {
    val n = y.length
    val z = Array.tabulate(n)(i => Array(1.0, 1.0 / xs(i)))
    var co = start.clone()
    def devOf(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        val mu = c(0) * z(i)(0) + c(1) * z(i)(1)
        if (mu <= 0) return Double.PositiveInfinity
        s += 2.0 * ((y(i) - mu) / mu - math.log(y(i) / mu)); i += 1
      }
      s
    }
    var dev = devOf(co)
    var it = 0
    while (it < 25) {
      val a = new Array[Double](4); val b = new Array[Double](2)
      var i = 0
      while (i < n) {
        val mu = co(0) * z(i)(0) + co(1) * z(i)(1)
        val w = 1.0 / (mu * mu)
        val zz = mu + (y(i) - mu) // identity link working response
        b(0) += w * zz * z(i)(0); b(1) += w * zz * z(i)(1)
        a(0) += w * z(i)(0) * z(i)(0); a(1) += w * z(i)(0) * z(i)(1)
        a(2) += w * z(i)(1) * z(i)(0); a(3) += w * z(i)(1) * z(i)(1)
        i += 1
      }
      var next = NbGlm.solve(a, b, 2)
      var devN = devOf(next)
      var h = 0
      while (h < 26 && !devN.isFinite) {
        next = Array((next(0) + co(0)) / 2, (next(1) + co(1)) / 2)
        devN = devOf(next); h += 1
      }
      val converged = math.abs(devN - dev) / (math.abs(devN) + 0.1) < 1e-8
      co = next; dev = devN
      if (converged) return co
      it += 1
    }
    co
  }

  /** MAD with the R default consistency constant 1.4826. */
  def mad(xs: Array[Double]): Double = {
    if (xs.isEmpty) return 0.0
    val med = medianOf(xs)
    1.4826 * medianOf(xs.map(v => math.abs(v - med)))
  }

  private def medianOf(xs: Array[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** MAP dispersion (outliers keep the gene estimate) + Wald test. */
  def mapAndWald(y: Array[Double], sf: Array[Double], x: Array[Array[Double]],
      alphaGw: Double, trendVal: Double, priorVar: Double,
      varLogDispEsts: Double): WaldRes = {
    val fGw = NbGlm.fit(y, sf, x, alphaGw)
    val aMap = NbGlm.maximizeAlpha(y, fGw.mu, x,
      priorMean = math.log(trendVal), priorVar = priorVar)
    val outlier = math.log(alphaGw) > math.log(trendVal) + 2.0 * math.sqrt(varLogDispEsts)
    val alphaFinal = if (outlier) alphaGw else aMap
    val f = NbGlm.fit(y, sf, x, alphaFinal)
    val lfc = f.beta(1); val se = f.se(1)
    val stat = lfc / se
    WaldRes(lfc, se, stat, Gamma.waldP(stat), alphaFinal, f.beta(0))
  }
}
