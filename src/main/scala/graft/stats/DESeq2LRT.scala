package graft.stats

import graft.core.Transformer
import graft.functions.BhFdr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DESeq2 likelihood-ratio test over an explicit factor design — the
  * semantics `DESeq2Timeseries` (reference differential.py:407-523)
  * DECLARES but does not implement: its body dead-ends into a default
  * Wald `DESeq()` call and the LRT lives only in comments
  * (differential.py:492-509, SURVEY.md §2.5 D4 "declared-but-broken").
  * We implement the intended test per the published DESeq2 model:
  *
  *   - formulas are factor-name lists (`full`, `reduced`) over per-sample
  *     factor level assignments — treatment-coded dummies with R's
  *     alphabetical first-level reference, intercept always included;
  *   - per gene: gene-wise dispersion on the full design, parametric
  *     trend + MAP shrinkage (same machinery as [[DESeq2Unpaired]]),
  *     then full and reduced NB GLM fits at the final dispersion;
  *   - stat = 2·(logLik_full − logLik_reduced),
  *     p = upper χ²(df = p_full − p_reduced), BH-adjusted FDR;
  *   - log2FC/lfcSE report the last dummy of the last full-design factor
  *     (matching R `results()` on an LRT fit).
  *
  * Scale: identical shuffle profile to DESeq2Unpaired — one size-factor
  * agg, map-side gene kernels, driver trend fit, BH windows.
  */
final case class DESeq2LRT(
    sampleColumns: Seq[String],
    factors: Map[String, Seq[String]],
    full: Seq[String],
    reduced: Seq[String],
    comparisonName: Option[String] = None,
    maxDriverGenes: Int = 2000000,
    index: String = "gene_stable_id") extends Transformer {

  require(reduced.toSet.subsetOf(full.toSet), "reduced design must nest in full")
  require(full.forall(factors.contains), "every design factor needs sample levels")
  factors.values.foreach(v => require(v.length == sampleColumns.length,
    "factor levels must align with sampleColumns"))

  val name = "DESeq2LRT"
  override def suffix: Option[String] =
    Some(comparisonName.fold(s" ($name)")(c => s" ($c)"))

  def logFCColumn: String = "log2FC" + suffix.get
  def pColumn: String = "p" + suffix.get
  def fdrColumn: String = "FDR" + suffix.get
  def baseMeanColumn: String = "baseMean" + suffix.get
  def lfcSEColumn: String = "lfcSE" + suffix.get
  def statColumn: String = "stat" + suffix.get
  def columns: Seq[String] =
    Seq(logFCColumn, pColumn, fdrColumn, baseMeanColumn, lfcSEColumn, statColumn)

  /** Treatment-coded design matrix for the given factor list. */
  private def designFor(names: Seq[String]): Array[Array[Double]] = {
    val colsPerFactor: Seq[Array[Array[Double]]] = names.map { f =>
      val levels = factors(f).distinct.sorted
      val nonRef = levels.drop(1)
      sampleColumns.indices.map { i =>
        nonRef.map(l => if (factors(f)(i) == l) 1.0 else 0.0).toArray
      }.toArray
    }
    sampleColumns.indices.map { i =>
      (Array(1.0) ++ colsPerFactor.flatMap(cf => cf(i))).toArray
    }.toArray
  }

  def apply(df0: DataFrame): DataFrame = run(df0, keepFit = false)

  /** [[apply]] plus the per-gene final-fit internals — `__alpha` (final
    * dispersion), `__bf` (full-design coefficient vector) and `__br`
    * (reduced-design coefficient vector): given these, the
    * log-likelihood ratio stat, the SE of the reported coefficient and
    * baseMean are closed-form (lgamma sums + a small matrix inverse),
    * so an external engine can replay them (the partial-oracle
    * pattern — the iterative fits stay spec-pinned). */
  def applyWithFit(df0: DataFrame): DataFrame = run(df0, keepFit = true)

  private def run(df0: DataFrame, keepFit: Boolean): DataFrame = {
    // read by the size-factor count/agg and again by the estimate pass —
    // cache so an expensive upstream plan executes once (bounded retention)
    val df = graft.core.CacheScope.retainInput(df0)
    val xFull = designFor(full)
    val xRed = designFor(reduced)
    val dfDelta = xFull(0).length - xRed(0).length
    require(dfDelta > 0, "full design must have more coefficients than reduced")

    val sf = DESeq2Unpaired.sizeFactors(df, sampleColumns)
    val bc = df.sparkSession.sparkContext.broadcast((xFull, xRed, sf))

    // gene-wise dispersion on the full design
    val geneEstUdf = udf { (ys: Seq[Double]) =>
      val (x, _, s) = bc.value
      DESeq2Unpaired.geneEstimate(ys.toArray, s, x)
    }
    val countsArr = array(sampleColumns.map(c => col(c).cast("double")): _*)
    val withEst = df.withColumn("__est", geneEstUdf(countsArr))
      .withColumn("__baseMean", col("__est.baseMean"))
      .withColumn("__alphaGw", col("__est.alpha"))
      .drop("__est")
    // the returned LRT plan reads this cache; bounded retention
    graft.core.CacheScope.retain(withEst)

    val pairs = withEst.select(col("__baseMean"), col("__alphaGw"))
      .where(col("__alphaGw") > 100 * NbGlm.MinDisp && col("__baseMean") > 0)
      .withColumn("__h", xxhash64(col("__baseMean"), col("__alphaGw")))
      .orderBy("__h").limit(maxDriverGenes)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val trend = DESeq2Unpaired.parametricTrend(pairs)
    val logRes = pairs.map { case (bm, a) => math.log(a) - math.log(trend(bm)) }
    val madSd = DESeq2Unpaired.mad(logRes)
    val varLogDispEsts = madSd * madSd
    val m = sampleColumns.length
    val p = xFull(0).length
    val priorVar =
      if (m > p) math.max(varLogDispEsts - Gamma.trigamma((m - p) / 2.0), 0.25) else 0.25

    val bcTrend = df.sparkSession.sparkContext.broadcast(
      (trend.a0, trend.a1, trend.flat, priorVar, varLogDispEsts, dfDelta))
    val lrtUdf = udf { (ys: Seq[Double], alphaGw: Double, baseMean: Double) =>
      val (xF, xR, s) = bc.value
      val (a0, a1, flat, pv, vld, dfd) = bcTrend.value
      val tr = if (flat) a0 else a0 + a1 / math.max(baseMean, 1e-8)
      DESeq2LRT.lrtKernel(ys.toArray, s, xF, xR, alphaGw, tr, pv, vld, dfd)
    }
    val res = withEst
      .withColumn("__r", lrtUdf(countsArr, col("__alphaGw"), col("__baseMean")))
      .withColumn(baseMeanColumn, col("__baseMean"))
      .withColumn(logFCColumn, col("__r.lfc"))
      .withColumn(lfcSEColumn, col("__r.se"))
      .withColumn(statColumn, col("__r.stat"))
      .withColumn(pColumn, col("__r.p"))
      .withColumn("__alpha", col("__r.alpha"))
      .withColumn("__bf", col("__r.betaFull"))
      .withColumn("__br", col("__r.betaRed"))
      .drop("__r", "__baseMean", "__alphaGw")

    val adjusted = BhFdr.adjust(res, pColumn, fdrColumn)
    val fitCols =
      if (keepFit) Seq(col("__alpha"), col("__bf"), col("__br")) else Nil
    adjusted.select((col(index) +: columns.map(col)) ++ fitCols: _*)
  }
}

object DESeq2LRT {

  /** [[lrtKernel]] result; `alpha`/`betaFull`/`betaRed` carry the
    * final-fit internals for the partial-oracle side table. */
  final case class LrtRes(lfc: Double, se: Double, stat: Double, p: Double,
      alpha: Double, betaFull: Array[Double], betaRed: Array[Double])

  /** Full-vs-reduced NB GLM likelihood ratio at the MAP dispersion. */
  def lrtKernel(y: Array[Double], sf: Array[Double],
      xFull: Array[Array[Double]], xRed: Array[Array[Double]],
      alphaGw: Double, trendVal: Double, priorVar: Double,
      varLogDispEsts: Double, dfDelta: Int): LrtRes = {
    val fGw = NbGlm.fit(y, sf, xFull, alphaGw)
    val aMap = NbGlm.maximizeAlpha(y, fGw.mu, xFull,
      priorMean = math.log(trendVal), priorVar = priorVar)
    val outlier = math.log(alphaGw) > math.log(trendVal) + 2.0 * math.sqrt(varLogDispEsts)
    val alphaFinal = if (outlier) alphaGw else aMap
    val fF = NbGlm.fit(y, sf, xFull, alphaFinal)
    val fR = NbGlm.fit(y, sf, xRed, alphaFinal)
    val llF = NbGlm.nbLogLik(y, fF.mu, alphaFinal)
    val llR = NbGlm.nbLogLik(y, fR.mu, alphaFinal)
    val stat = math.max(2.0 * (llF - llR), 0.0)
    val pVal = SpecialFunctions.regGammaQ(dfDelta / 2.0, stat / 2.0)
    val k = fF.beta.length - 1
    LrtRes(fF.beta(k), fF.se(k), stat, pVal, alphaFinal, fF.beta, fR.beta)
  }
}
