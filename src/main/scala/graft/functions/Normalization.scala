package graft.functions

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-matrix normalization (reference SURVEY.md §2.4 A1/A8/A9).
  *
  * The reference delegates TMM to edgeR via embedded R
  * (src/mdataframe/transformations.py:79-152); we re-implement the published
  * algorithms natively (edgeR `calcNormFactors`/`cpm`, Robinson & Oshlack
  * 2010; limma `removeBatchEffect`) on Spark primitives:
  *
  *  - library sizes / quantiles: ONE aggregation pass over the distributed
  *    genes dimension (A1);
  *  - per-pair M/A/weight values: map-side expressions on a long
  *    (gene × pair) frame — `pairId` keys the trim windows, so all sample
  *    pairs rank in parallel;
  *  - the trimmed weighted means reduce to S-1 tiny rows collected to the
  *    driver; the final log-CPM is a pure map-side select with literal
  *    factors — no further shuffle;
  *  - batch-effect removal is an exact linear map on the (small) samples
  *    axis: `(I − X_b (XᵀX)⁻¹Xᵀ|_b) · y` has FIXED coefficients given the
  *    batch design, so it compiles to per-column linear-combination
  *    expressions — fully distributed, zero shuffle.
  *
  * Golden conformance: reference tests/test_transformations.py:74-105 at
  * 1e-5 (see NormalizationSpec).
  */
object Normalization {

  /** Row-count threshold below which exact `percentile` is used. The
    * exact aggregate buffers EVERY input value in the final reduce task
    * — a single-task memory wall at scale — while past ~10⁶ rows
    * adjacent order statistics are numerically indistinguishable, so
    * `percentile_approx` at 1e-5 rank accuracy is used instead. Small
    * inputs keep the exact interpolated percentile (R quantile type 7,
    * golden-pinned). */
  val ExactPercentileCutoff: Long = 1000000L

  /** Percentile aggregate with the [[ExactPercentileCutoff]] switch. */
  def scalablePercentile(c: Column, p: Double, exact: Boolean): Column =
    if (exact) percentile(c, lit(p)) else percentile_approx(c, lit(p), lit(100000))

  /** Per-column library sizes (A1, transformations.py:105): one agg row. */
  def libSizes(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val row = df.agg(
      sum(col(cols.head).cast("double")).as(cols.head),
      cols.tail.map(c => sum(col(c).cast("double")).as(c)): _*).collect()(0)
    cols.map(c => c -> row.getAs[Double](c)).toMap
  }

  /** edgeR reference-column selection: column whose 75th-percentile
    * count/libsize is closest to the mean of those. */
  def refColumn(df: DataFrame, cols: Seq[String], lib: Map[String, Double],
      exact: Boolean = true): String = {
    val row = df.agg(
      scalablePercentile(col(cols.head).cast("double"), 0.75, exact).as(cols.head),
      cols.tail.map(c =>
        scalablePercentile(col(c).cast("double"), 0.75, exact).as(c)): _*).collect()(0)
    val f75 = cols.map(c => c -> row.getAs[Double](c) / lib(c)).toMap
    val mean = f75.values.sum / f75.size
    cols.minBy(c => math.abs(f75(c) - mean))
  }

  /** libSizes + refColumn in ONE aggregation pass (sample-axis stats are
    * a single small row; no reason to scan twice). */
  def libAndRef(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): (Map[String, Double], String) = {
    val aggs = cols.map(c => sum(col(c).cast("double")).as(s"__s_$c")) ++
      cols.map(c =>
        scalablePercentile(col(c).cast("double"), 0.75, exact).as(s"__p_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val lib = cols.map(c => c -> row.getAs[Double](s"__s_$c")).toMap
    val f75 = cols.map(c => c -> row.getAs[Double](s"__p_$c") / lib(c)).toMap
    val mean = f75.values.sum / f75.size
    (lib, cols.minBy(c => math.abs(f75(c) - mean)))
  }

  /** edgeR `calcNormFactors(method="TMM")`: trimmed (30% on M, 5% on A)
    * weighted mean of M-values vs the reference column, normalized to a
    * geometric mean of 1. Exact ranks use windows partitioned by sample
    * pair; `approximate=true` replaces the rank trim with
    * `percentile_approx` cutoffs for the 100 TB path (no global sort). */
  def tmmFactors(
      df: DataFrame,
      cols: Seq[String],
      logratioTrim: Double = 0.3,
      sumTrim: Double = 0.05,
      doWeighting: Boolean = true,
      approximate: Boolean = false,
      exactCutoff: Long = 2000000L): Map[String, Double] =
    tmmAndLib(df, cols, logratioTrim, sumTrim, doWeighting, approximate, exactCutoff)._2

  /** TMM factors + library sizes from ONE sample-axis aggregation and one
    * count — callers that need both (edgeR, the Tmm transformer) would
    * otherwise re-aggregate the same columns in separate jobs. */
  def tmmAndLib(
      df: DataFrame,
      cols: Seq[String],
      logratioTrim: Double = 0.3,
      sumTrim: Double = 0.05,
      doWeighting: Boolean = true,
      approximate: Boolean = false,
      exactCutoff: Long = 2000000L): (Map[String, Double], Map[String, Double]) = {
    // one count drives every scale switch below (usually the caller has
    // cached df, making this a cheap columnar pass): exact-vs-approx
    // 75th percentile in libAndRef, and the trim-path choice
    val nRows = df.count()
    val (lib, ref) = libAndRef(df, cols, exact = nRows <= ExactPercentileCutoff)
    val nR = lib(ref)
    val others = cols.filterNot(_ == ref)
    if (others.isEmpty) return (lib, Map(ref -> 1.0))

    // long (pairId, M, A, w) frame; only rows with obs>0 && ref>0 are
    // finite (counts are non-negative) — matches edgeR's is.finite filter.
    val pairStructs = others.zipWithIndex.map { case (c, i) =>
      val obs = col(c).cast("double"); val rf = col(ref).cast("double")
      val nO = lit(lib(c))
      // guard: compute only where both counts are positive — ANSI mode
      // would otherwise throw on the division before the `ok` filter runs
      val ok = obs > 0 && rf > 0
      struct(
        lit(i).as("pid"),
        when(ok, log2((obs / nO) / (rf / nR))).as("m"),
        when(ok, log2((obs / nO) * (rf / nR)) * 0.5).as("a"),
        when(ok, (nO - obs) / nO / obs + (lit(nR) - rf) / nR / rf).as("w"),
        ok.as("ok"))
    }
    // the exact-rank path's windows partition by pid, so its parallelism
    // is the number of sample PAIRS, not the data size — a per-pair
    // single-task sort that serializes at millions of genes. Past the
    // cutoff, trim by approximate quantile cutoffs instead (fully
    // parallel; 1e-4 rank accuracy, indistinguishable trim boundaries at
    // that scale). Small inputs keep exact R average-rank semantics
    // (golden-pinned).
    val useApprox = approximate || nRows * others.length > exactCutoff
    val long0 = df.select(explode(array(pairStructs: _*)).as("e"))
      .select(col("e.pid").as("pid"), col("e.m").as("m"), col("e.a").as("a"), col("e.w").as("w"))
      .where(col("e.ok"))
    // the approximate path makes two passes (cutoff agg + trimmed agg) —
    // cache so the explode lineage runs once; the exact path is a single
    // windowed pass and needs no cache
    val long = if (useApprox) long0.cache() else long0
    try {
    val stats: Map[Int, (Double, Double)] = if (useApprox) {
      // scale path: trim by approximate quantile cutoffs instead of ranks
      val cuts = long.groupBy("pid").agg(
        percentile_approx(col("m"), array(lit(logratioTrim), lit(1 - logratioTrim)), lit(10000)).as("mc"),
        percentile_approx(col("a"), array(lit(sumTrim), lit(1 - sumTrim)), lit(10000)).as("ac"),
        max(abs(col("m"))).as("maxabs"))
      val kept = long.join(broadcast(cuts), "pid")
        .where(col("m") >= col("mc")(0) && col("m") <= col("mc")(1) &&
          col("a") >= col("ac")(0) && col("a") <= col("ac")(1))
      kept.groupBy("pid").agg(
        (sum(col("m") / col("w")) / sum(lit(1.0) / col("w"))).as("fw"),
        avg(col("m")).as("fu"), first("maxabs").as("maxabs"))
        .collect().map(r => r.getInt(0) ->
          (if (doWeighting) r.getDouble(1) else r.getDouble(2), r.getDouble(3))).toMap
    } else {
      // exact path: R average ranks = min-rank + (peers-1)/2
      val wm = Window.partitionBy("pid").orderBy("m")
      val wa = Window.partitionBy("pid").orderBy("a")
      val wp = Window.partitionBy("pid")
      val ranked = long
        .withColumn("n", count(lit(1)).over(wp))
        .withColumn("maxabs", max(abs(col("m"))).over(wp))
        .withColumn("rm", rank().over(wm) +
          (count(lit(1)).over(Window.partitionBy("pid", "m")) - 1) / 2.0)
        .withColumn("ra", rank().over(wa) +
          (count(lit(1)).over(Window.partitionBy("pid", "a")) - 1) / 2.0)
      val loL = floor(col("n") * logratioTrim) + 1
      val hiL = col("n") + 1 - loL
      val loS = floor(col("n") * sumTrim) + 1
      val hiS = col("n") + 1 - loS
      ranked
        .where(col("rm") >= loL && col("rm") <= hiL && col("ra") >= loS && col("ra") <= hiS)
        .groupBy("pid").agg(
          (sum(col("m") / col("w")) / sum(lit(1.0) / col("w"))).as("fw"),
          avg(col("m")).as("fu"), first("maxabs").as("maxabs"))
        .collect().map(r => r.getInt(0) ->
          (if (doWeighting) r.getDouble(1) else r.getDouble(2), r.getDouble(3))).toMap
    }

    val raw = cols.map { c =>
      if (c == ref) c -> 1.0
      else {
        val i = others.indexOf(c)
        c -> (stats.get(i) match {
          case Some((f, maxabs)) if maxabs >= 1e-6 => math.pow(2.0, f)
          case _ => 1.0
        })
      }
    }.toMap
    // normalize: factors multiply to 1 (geometric mean 1)
    val gm = math.exp(raw.values.map(math.log).sum / raw.size)
    (lib, raw.map { case (c, f) => c -> f / gm })
    } finally if (useApprox) long.unpersist(blocking = false)
  }

  /** edgeR `cpm(log=TRUE, prior.count=k)` with effective library sizes:
    * prior scaled per sample, log2((count + prior_s) / (lib_s + 2·prior_s)
    * · 1e6). Pure map-side select with literal factors. */
  def logCpm(df: DataFrame, cols: Seq[String], lib: Map[String, Double],
      factors: Map[String, Double], priorCount: Double = 5.0): DataFrame = {
    val eff = cols.map(c => c -> lib(c) * factors.getOrElse(c, 1.0)).toMap
    val meanLib = eff.values.sum / eff.size
    df.withColumns(cols.map { c =>
      val prior = priorCount * eff(c) / meanLib
      val adjLib = eff(c) + 2 * prior
      c -> log2((col(c).cast("double") + lit(prior)) / lit(adjLib) * lit(1e6))
    }.toMap)
  }

  /** Plain counts-per-million (no log, no prior): count/libsize·1e6. */
  def cpm(df: DataFrame, cols: Seq[String], lib: Map[String, Double],
      factors: Map[String, Double] = Map.empty): DataFrame =
    df.withColumns(cols.map { c =>
      c -> (col(c).cast("double") / lit(lib(c) * factors.getOrElse(c, 1.0)) * lit(1e6))
    }.toMap)

  /** limma `removeBatchEffect(x, batch)` (transformations.py:139-148 / A9):
    * per-gene OLS residuals w.r.t. a sum-contrast batch design with
    * intercept. Because the design is identical for every gene, the
    * correction is the fixed linear map (I − X_b·C_b) applied to the sample
    * vector — compiled to per-column linear-combination expressions
    * (embarrassingly parallel over genes, zero shuffle). */
  /** The (samples × samples) batch-effect projection: data-independent,
    * determined solely by the batch assignment (contr.sum design, as in
    * limma removeBatchEffect). Exposed so the DuckDB oracle can embed the
    * identical coefficients. */
  def batchProjection(cols: Seq[String], batches: Map[String, String]): Array[Array[Double]] = {
    import breeze.linalg.{DenseMatrix, pinv}
    val s = cols.size
    val levels = cols.map(batches).distinct.sorted
    val l = levels.size
    require(l >= 2, "removeBatchEffect needs at least two batch levels")
    // contr.sum contrasts: level i (< last) → e_i; last level → -1 everywhere
    val xb = DenseMatrix.tabulate(s, l - 1) { (si, j) =>
      val lev = levels.indexOf(batches(cols(si)))
      if (lev == j) 1.0 else if (lev == l - 1) -1.0 else 0.0
    }
    val x = DenseMatrix.horzcat(DenseMatrix.ones[Double](s, 1), xb)
    val c = pinv(x.t * x) * x.t                    // (l × s)
    val cb = c(1 until l, ::)                      // batch-coefficient rows
    val p = xb * cb                                // (s × s) projection
    Array.tabulate(s, s)((i, j) => p(i, j))
  }

  def removeBatchEffect(df: DataFrame, cols: Seq[String],
      batches: Map[String, String]): DataFrame = {
    val p = batchProjection(cols, batches)
    df.withColumns(cols.zipWithIndex.map { case (ci, i) =>
      ci -> (col(ci).cast("double") - cols.zipWithIndex.map { case (cj, j) =>
        lit(p(i)(j)) * col(cj).cast("double")
      }.reduce(_ + _))
    }.toMap)
  }
}

/** The reference's `TMM` transformer (transformations.py:63-152): TMM
  * normalization factors → log2 CPM (prior.count=5) → optional batch-effect
  * removal, with the suffix contract " (TMM)" / " (TMM batch-corrected)". */
final case class Tmm(
    samplesToGroup: Option[Map[String, String]] = None,
    batchEffects: Option[Map[String, String]] = None,
    suffixArg: Option[String] = None,
    suffixDefault: Boolean = false,
    priorCount: Double = 5.0,
    approximate: Boolean = false,
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {
  val name = "TMM"
  override def suffix: Option[String] = suffixArg.orElse(
    if (suffixDefault)
      Some(if (batchEffects.isEmpty) " (TMM)" else " (TMM batch-corrected)")
    else None)

  def apply(df: DataFrame): DataFrame = {
    val cols = graft.operators.Transforms.numericValueColumns(df, protect)
    // tmmAndLib counts + aggregates, and the returned logCpm plan re-reads
    // the input: cache it here (respecting a caller-established cache)
    // instead of assuming the caller did
    val input = graft.core.CacheScope.retainInput(df)
    val (lib, factors) = Normalization.tmmAndLib(input, cols, approximate = approximate)
    val logged = Normalization.logCpm(input, cols, lib, factors, priorCount)
    val corrected = batchEffects match {
      case Some(b) => Normalization.removeBatchEffect(logged, cols, b)
      case None    => logged
    }
    applySuffix(corrected, protect)
  }
}
