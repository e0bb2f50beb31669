package graft.stats

import graft.core.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DESeq2 `vst` variance-stabilizing transformation (reference
  * src/mdataframe/transformations.py:155-218: `DESeqDataSetFromMatrix` →
  * `vst(dds, nsub)`), reimplemented on the published algorithm (Love et
  * al. 2014; DESeq2 vignette):
  *
  *   1. size factors by median-of-ratios (same exact formulation as
  *      [[DESeq2Unpaired]]);
  *   2. gene-wise dispersions with a blind (intercept-only) design —
  *      `vst` defaults to `blind=TRUE`, so the condition labels the
  *      reference passes are NOT used in the fit;
  *   3. parametric dispersion trend α(μ) = asymptDisp + extraPois/μ on a
  *      ≤ nsub sample of genes with baseMean > 5 (the reference passes
  *      nsub = min(nGenes, 1000));
  *   4. the closed-form transform
  *      u = log2((1 + ep + 2·ad·q + 2·√(ad·q·(1 + ep + ad·q))) / (4·ad))
  *      applied to normalized counts q — a pure map-side expression.
  *
  * Scale: one agg for size factors, one map-side pass for gene estimates,
  * a driver-side 2-parameter fit over a capped sample, then a codegen'd
  * select for the transform. Suffix contract: every sample column is
  * renamed `col + " (VST)"` when suffixed (transformations.py:164-166).
  */
final case class Vst(
    samplesToGroup: Option[Map[String, String]] = None,
    nsub: Int = 1000,
    suffixed: Boolean = false,
    maxDriverGenes: Int = 1000000,
    index: String = "gene_stable_id") extends Transformer {

  val name = "VST"
  override def suffix: Option[String] = if (suffixed) Some(" (VST)") else None

  /** Fitted trend from the last apply (sklearn-style fitted attribute):
    * (asymptDisp, extraPois) — the two coefficients of
    * α(μ) = asymptDisp + extraPois/μ that fully determine the closed-form
    * transform given the size factors. None before a fit. */
  @transient var lastTrend: Option[(Double, Double)] = None

  def apply(df0: DataFrame): DataFrame = {
    // the input is read three times (size-factor agg, trend collect, the
    // returned transform) — without a cache the upstream plan (often an
    // expensive aggregation) re-executes per pass; the returned plan also
    // reads it, so bounded retention rather than scratch unpersist
    val df = graft.core.CacheScope.retainInput(df0)
    val samples = df.columns.toSeq.filterNot(_ == index)
    val nS = samples.length

    // ---- 1. size factors (median-of-log-ratios, exact below cutoff) ----
    val sf = DESeq2Unpaired.sizeFactors(df, samples)

    // ---- 2. blind gene-wise dispersions (intercept-only design) ----
    val interceptDesign: Array[Array[Double]] = Array.fill(nS)(Array(1.0))
    val bc = df.sparkSession.sparkContext.broadcast((interceptDesign, sf))
    val geneEstUdf = udf { (ys: Seq[Double]) =>
      val (x, s) = bc.value
      DESeq2Unpaired.geneEstimate(ys.toArray, s, x)
    }
    val countsArr = array(samples.map(c => col(c).cast("double")): _*)
    val withEst = df.withColumn("__est", geneEstUdf(countsArr))

    // ---- 3. parametric trend on ≤ nsub genes with baseMean > 5 ----
    // (vst subsamples evenly along the baseMean order; a hash-capped
    // deterministic sample is the shuffle-free equivalent at scale)
    val cap = math.min(nsub.toLong, maxDriverGenes.toLong)
    val pairs = withEst
      .select(col("__est.baseMean").as("bm"), col("__est.alpha").as("a"))
      .where(col("a") > 100 * NbGlm.MinDisp && col("bm") > 5.0)
      .withColumn("__h", xxhash64(col("bm"), col("a")))
      .orderBy("__h").limit(cap.toInt)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val trend = DESeq2Unpaired.parametricTrend(pairs)
    // flat trend (parametric fit failed / degenerate): constant dispersion
    // a0 with extraPois = 0 — the closed form below then reduces to the
    // exact constant-dispersion VST log2((1 + 2aq + 2sqrt(aq(1+aq)))/(4a)),
    // DESeq2's fitType="mean" formula, so only ep needs the branch
    val ad = trend.a0
    val ep = if (trend.flat) 0.0 else trend.a1
    require(ad > 0, s"VST needs a positive asymptotic dispersion, got $ad")
    lastTrend = Some((ad, ep))

    // ---- 4. closed-form transform of normalized counts ----
    val out = df.select(col(index) +: samples.map { c =>
      val q = col(c).cast("double") / lit(sf(samples.indexOf(c)))
      (log((lit(1.0 + ep) + lit(2.0 * ad) * q +
        lit(2.0) * sqrt(lit(ad) * q * (lit(1.0 + ep) + lit(ad) * q))) / lit(4.0 * ad))
        / lit(math.log(2.0))).as(c)
    }: _*)
    applySuffix(out, Seq(index))
  }
}
