package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Transformer
import graft.functions.{BhFdr, Normalization}

/** Pure per-gene kernels for the edgeR classic (qCML) pipeline that the
  * reference drives through embedded R (differential.py:119-150:
  * `DGEList` → `calcNormFactors` → `estimateDisp` → `exactTest` →
  * `topTags`). Reimplemented from the published algorithms (Robinson &
  * Smyth 2008 quantile-adjusted conditional maximum likelihood; Chen,
  * Lun & Smyth 2014 weighted likelihood empirical Bayes):
  *
  *  - `equalizeLibSizes`: per-group one-coefficient NB GLM fit, then
  *    quantile-to-quantile NB mapping (`q2qnbinom`, mean of normal and
  *    gamma approximations) onto the geometric-mean library size;
  *  - `estimateDisp` classic path: conditional log-likelihood of the
  *    pseudo-counts on a 21-point log2-dispersion grid, summed for the
  *    common value, moving-averaged along AveLogCPM for the trend, and
  *    shrunk per-gene with prior.df weight for the tagwise values;
  *  - `exactTest`: double-tail exact NB test on pseudo-count sums with
  *    a beta approximation for large counts (`big.count`).
  *
  * Everything here is a scalar/array function: the genes axis stays
  * distributed and each gene's kernel is O(samples) map-side work.
  */
object EdgeRKernel {

  /** estimateDisp grid: spline.pts = -10..10 (21 pts), disp = 0.1·2^pt. */
  val SplinePts: Array[Double] = Array.tabulate(21)(i => -10.0 + i.toDouble)
  val GridDisp: Array[Double] = SplinePts.map(p => 0.1 * math.pow(2.0, p))
  val GridDelta: Array[Double] = GridDisp.map(d => d / (1.0 + d))

  /** Single-coefficient NB log-link GLM (edgeR mglmOneGroup): Fisher
    * scoring for beta in mu_j = exp(beta + offset_j). */
  def mglmOneGroup(y: Array[Double], offset: Array[Double], dispersion: Double,
      maxIter: Int = 50, tol: Double = 1e-10): Double = {
    var sy = 0.0
    var se = 0.0
    var j = 0
    while (j < y.length) { sy += y(j); se += math.exp(offset(j)); j += 1 }
    if (sy <= 0.0) return Double.NegativeInfinity
    var beta = math.log(sy / se)
    var it = 0
    while (it < maxIter) {
      var score = 0.0
      var info = 0.0
      j = 0
      while (j < y.length) {
        val mu = math.exp(beta + offset(j))
        val d = 1.0 + dispersion * mu
        score += (y(j) - mu) / d
        info += mu / d
        j += 1
      }
      if (info <= 0.0) it = maxIter
      else {
        val step = score / info
        beta += step
        if (math.abs(step) < tol) it = maxIter else it += 1
      }
    }
    beta
  }

  /** edgeR q2qnbinom: map count x from a NB with mean inMean to the
    * quantile-equivalent value under mean outMean (same dispersion),
    * averaging the normal and gamma approximations. */
  def q2qnbinom(x: Double, inMean0: Double, outMean0: Double, disp: Double): Double = {
    import SpecialFunctions._
    var inMean = inMean0
    var outMean = outMean0
    if (inMean < 1e-14 || outMean < 1e-14) { inMean += 0.25; outMean += 0.25 }
    val ri = 1.0 + disp * inMean
    val vi = inMean * ri
    val ro = 1.0 + disp * outMean
    val vo = outMean * ro
    val lower = x < inMean
    val p1 = pnorm(x, inMean, math.sqrt(vi), lowerTail = lower)
    val p2 = pgamma(x, inMean / ri, ri, lowerTail = lower)
    val q1 = qnorm(p1, outMean, math.sqrt(vo), lowerTail = lower)
    val q2 = qgamma(p2, outMean / ro, ro, lowerTail = lower)
    math.max(0.0, 0.5 * (q1 + q2))
  }

  /** edgeR equalizeLibSizes for one gene: per-group abundance fit, then
    * q2q map of each sample's count onto the common library size. */
  def pseudoCounts(y: Array[Double], groupOf: Array[Int], nGroups: Int,
      effLib: Array[Double], commonLib: Double, disp: Double): Array[Double] = {
    val out = new Array[Double](y.length)
    var g = 0
    while (g < nGroups) {
      val idx = (0 until y.length).filter(groupOf(_) == g).toArray
      val yg = idx.map(y(_))
      val og = idx.map(j => math.log(effLib(j)))
      val beta = mglmOneGroup(yg, og, disp)
      val lambda = math.exp(beta)
      var k = 0
      while (k < idx.length) {
        val j = idx(k)
        out(j) =
          if (lambda <= 0.0 || lambda.isNaN) 0.0
          else q2qnbinom(y(j), lambda * effLib(j), lambda * commonLib, disp)
        k += 1
      }
      g += 1
    }
    out
  }

  /** Conditional log-likelihood of one group's (equal-libsize) pseudo
    * counts at delta = disp/(1+disp) (edgeR condLogLikDerDelta, der=0). */
  def condLogLikDelta(y: Array[Double], delta: Double): Double = {
    val r = (1.0 - delta) / delta
    val n = y.length
    var z = 0.0
    var s = 0.0
    var j = 0
    while (j < n) { z += y(j); s += Gamma.lgamma(y(j) + r); j += 1 }
    s + Gamma.lgamma(n * r) - Gamma.lgamma(z + n * r) - n * Gamma.lgamma(r)
  }

  /** Per-gene conditional log-likelihood over the 21-point grid, summed
    * over groups (the classic estimateDisp "l0" matrix row). */
  def l0Grid(pseudo: Array[Double], groupOf: Array[Int], nGroups: Int): Array[Double] = {
    val byGroup = (0 until nGroups).map { g =>
      (0 until pseudo.length).filter(groupOf(_) == g).map(pseudo(_)).toArray
    }
    GridDelta.map { delta =>
      var s = 0.0
      byGroup.foreach { yg => if (yg.length > 0) s += condLogLikDelta(yg, delta) }
      s
    }
  }

  /** Per-gene ingredient for the empirical prior.df estimate (edgeR
    * estimateDisp with prior.df=NULL routes deviance-residual variances
    * through limma squeezeVar/fitFDist; Chen, Lun & Smyth 2014): fit the
    * one-way NB GLM at the trended dispersion, form
    * s2 = deviance / df.residual (df zero-adjusted as edgeR's .residDF),
    * and return [e, trigamma(df/2)] with
    * e = log(s2) − digamma(df/2) + log(df/2) (the log-F moment-matching
    * statistic fitFDist averages). Null when the gene carries no residual
    * information (df ≤ 0 or zero deviance). */
  def priorDfStat(y: Array[Double], groupOf: Array[Int], nGroups: Int,
      effLib: Array[Double], disp: Double): Array[Double] = {
    val n = y.length
    val mu = new Array[Double](n)
    var g = 0
    while (g < nGroups) {
      val idx = (0 until n).filter(groupOf(_) == g).toArray
      val og = idx.map(j => math.log(effLib(j)))
      val beta = mglmOneGroup(idx.map(y(_)), og, disp)
      var k = 0
      while (k < idx.length) {
        mu(idx(k)) = if (beta.isNegInfinity) 0.0 else math.exp(beta + og(k))
        k += 1
      }
      g += 1
    }
    // zero-adjusted residual df (edgeR .residDF): observations where both
    // the count and the fit are ~zero carry no information; a group losing
    // every observation also loses its coefficient
    var nzero = 0
    val groupAlive = new Array[Boolean](nGroups)
    var j = 0
    while (j < n) {
      if (y(j) < 1e-4 && mu(j) < 1e-4) nzero += 1
      else groupAlive(groupOf(j)) = true
      j += 1
    }
    val dfResid = n - nzero - groupAlive.count(identity)
    if (dfResid <= 0) return null
    val r = 1.0 / disp
    var dev = 0.0
    j = 0
    while (j < n) {
      val yj = y(j); val mj = mu(j)
      if (!(yj < 1e-4 && mj < 1e-4)) {
        val t1 = if (yj > 0) yj * math.log(yj / math.max(mj, 1e-300)) else 0.0
        dev += 2.0 * (t1 - (yj + r) * math.log((yj + r) / (mj + r)))
      }
      j += 1
    }
    if (!(dev > 0)) return null
    val s2 = dev / dfResid
    val half = dfResid / 2.0
    Array(math.log(s2) - Gamma.digamma(half) + math.log(half), Gamma.trigamma(half))
  }

  /** Fit the prior degrees of freedom by moment-matching log-scale
    * deviance-residual variances to a scaled F (limma fitFDist):
    * Var(e) − mean(trigamma(df1/2)) estimates trigamma(df2/2), so
    * df2 = 2·trigammaInverse(·). `eDf` must carry columns `e` and `tri`
    * as produced per-gene by [[priorDfStat]]. With `winsorize`, moments
    * are taken after clamping e at its (5%, 90%) quantiles
    * (fitFDistRobustly's winsor.tail.p = c(0.05, 0.1)) — a global
    * approximation of the robust fit. Returns df2 capped at 1e8
    * (evar ≤ 0 ⇒ no gene-to-gene heterogeneity ⇒ full shrink to trend);
    * 0 when fewer than two informative genes exist. */
  /** Variance retained by winsorizing a standard normal at its (5%, 90%)
    * quantiles (closed form: clamp at a=Φ⁻¹(.05), b=Φ⁻¹(.90) with point
    * masses 0.05/0.10, E[w²] via Φ(x)−xφ(x)). Clamping shrinks the
    * observed variance even on clean data; dividing by this factor
    * restores it — the constant-factor stand-in for limma
    * fitFDistRobustly's exact theoretical-winsorized-moment match. */
  val WinsorVarFactor: Double = 0.754285

  def fitFDistDf2(eDf: DataFrame, winsorize: Boolean): Double = {
    val (w, corr) =
      if (winsorize) {
        val qs = eDf.stat.approxQuantile("e", Array(0.05, 0.90), 1e-3)
        if (qs.length < 2) return 0.0
        (greatest(lit(qs(0)), least(lit(qs(1)), col("e"))), WinsorVarFactor)
      } else (col("e"), 1.0)
    val r = eDf.agg(var_samp(w).as("ev"), avg(col("tri")).as("mt"),
      count(lit(1)).as("n")).collect()(0)
    // hyperparameter estimation needs enough genes for the winsor tails
    // to hold at least one point (1/0.05); below that the fit is noise —
    // leave tagwise dispersions unshrunk (matches R's observed behavior
    // on the 4-gene reference golden frame, EdgeRSpec)
    if (r.getAs[Long]("n") < 20) 0.0
    else {
      val evar = r.getAs[Double]("ev") / corr - r.getAs[Double]("mt")
      val df2 = if (evar > 0) math.min(2.0 * Gamma.trigammaInverse(evar), 1e8) else 1e8
      if (sys.props.contains("graft.edger.debug"))
        println(s"fitFDistDf2: n=${r.getAs[Long]("n")} ev=${r.getAs[Double]("ev")} " +
          s"mt=${r.getAs[Double]("mt")} evar=$evar df2=$df2")
      df2
    }
  }

  /** Maximize a natural cubic spline through (SplinePts, ll): exact
    * per-interval cubic maximization (derivative roots in closed form),
    * as in edgeR maximizeInterpolant. Returns the maximizing point. */
  def maximizeInterpolant(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length
    // natural spline second derivatives via Thomas algorithm
    val m = new Array[Double](n)
    val cp = new Array[Double](n)
    val dp = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      val h0 = xs(i) - xs(i - 1)
      val h1 = xs(i + 1) - xs(i)
      val a = h0 / 6.0
      val b = (h0 + h1) / 3.0
      val c = h1 / 6.0
      val d = (ys(i + 1) - ys(i)) / h1 - (ys(i) - ys(i - 1)) / h0
      val w = if (i == 1) b else b - a * cp(i - 1)
      cp(i) = c / w
      dp(i) = (d - (if (i == 1) 0.0 else a * dp(i - 1))) / w
      i += 1
    }
    i = n - 2
    while (i >= 1) {
      m(i) = dp(i) - cp(i) * (if (i == n - 2) 0.0 else m(i + 1))
      i -= 1
    }
    var bestX = xs(0)
    var bestY = ys(0)
    def consider(x: Double, y: Double): Unit = if (y > bestY) { bestY = y; bestX = x }
    i = 0
    while (i < n) { consider(xs(i), ys(i)); i += 1 }
    i = 0
    while (i < n - 1) {
      val h = xs(i + 1) - xs(i)
      // S(x) over [x_i, x_i+1]; derivative is quadratic in t = x - x_i:
      // S'(t) = c1 + c2 t + c3 t², with
      val c1 = (ys(i + 1) - ys(i)) / h - h * (2.0 * m(i) + m(i + 1)) / 6.0
      val c2 = m(i)
      val c3 = (m(i + 1) - m(i)) / (2.0 * h)
      val roots: Seq[Double] =
        if (math.abs(c3) < 1e-300) { if (math.abs(c2) > 0) Seq(-c1 / c2) else Seq.empty }
        else {
          val disc = c2 * c2 - 4.0 * c3 * c1
          if (disc < 0) Seq.empty
          else {
            val sq = math.sqrt(disc)
            Seq((-c2 + sq) / (2.0 * c3), (-c2 - sq) / (2.0 * c3))
          }
        }
      roots.foreach { t =>
        if (t > 0 && t < h) {
          val a = (xs(i + 1) - (xs(i) + t)) / h
          val b = 1.0 - a
          val y = a * ys(i) + b * ys(i + 1) +
            ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) * h * h / 6.0
          consider(xs(i) + t, y)
        }
      }
      i += 1
    }
    bestX
  }

  /** Maximize the grid log-likelihood; returns the dispersion 0.1·2^pt. */
  def maximizeGridDisp(ll: Array[Double]): Double =
    0.1 * math.pow(2.0, maximizeInterpolant(SplinePts, ll))

  /** Moving average of each element of a 21-array column over rows
    * [i−half1, i+half2] in `order`, appended as `outCol` — computed with
    * prefix sums + lead/lag so every window frame is O(n) (edgeR
    * movingAverageByCol's cumsum formulation; a sliding avg frame would
    * re-aggregate O(width) per row). Edge windows divide by the actual
    * row count, matching the R behavior. */
  /** Above this many rows the ordered moving average switches from the
    * single-partition window formulation to the distributed prefix-sum
    * one — an un-partitioned Spark window materializes the WHOLE frame
    * in one task, which the 30× scaling probe measured as the dominant
    * serial stage of q_edger at 600k genes. Crossover measured on
    * local[32]: windowed wins at 200k rows (13 s vs 19 s), distributed
    * wins at 600k (41 s vs 71 s). */
  val MovingAvgWindowCutoff: Long = 300000L

  /** Moving average of a 21-array column along a total order. `nRows`
    * (when the caller knows it) selects the path: below the cutoff a
    * global-order window computes prefix sums in one task (cheapest for
    * small frames); above it, the distributed formulation — range-
    * partitioned sort + zipWithIndex, per-partition prefix sums with
    * broadcast partition offsets, then two equi-joins fetch the window's
    * boundary cumulatives — keeps every stage parallel. */
  def movingAvgArray(df: org.apache.spark.sql.DataFrame, arrCol: String,
      outCol: String, order: Seq[org.apache.spark.sql.Column],
      half1: Long, half2: Long, nRows: Long = -1L): org.apache.spark.sql.DataFrame =
    if (nRows > MovingAvgWindowCutoff)
      movingAvgArrayDistributed(df, arrCol, outCol, order, half1, half2, nRows)
    else movingAvgArrayWindowed(df, arrCol, outCol, order, half1, half2)

  private[graft] def movingAvgArrayWindowed(df: org.apache.spark.sql.DataFrame, arrCol: String,
      outCol: String, order: Seq[org.apache.spark.sql.Column],
      half1: Long, half2: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.orderBy(order: _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val k = 21
    val s1 = df
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__cum", array((0 until k).map(i => sum(col(arrCol)(i)).over(wCum)): _*))
      .withColumn("__tot", array((0 until k).map(i => sum(col(arrCol)(i)).over(wAll)): _*))
    val lo = greatest(col("__rn") - half1, lit(1L))
    val hi = least(col("__rn") + half2, col("__n"))
    val cnt = (hi - lo + 1).cast("double")
    val avgCols = (0 until k).map { i =>
      val upper = coalesce(lead(col("__cum")(i), half2.toInt).over(wOrd), col("__tot")(i))
      val lower = coalesce(lag(col("__cum")(i), (half1 + 1).toInt).over(wOrd), lit(0.0))
      (upper - lower) / cnt
    }
    s1.withColumn(outCol, array(avgCols: _*))
      .drop("__rn", "__n", "__cum", "__tot")
  }

  private[graft] def movingAvgArrayDistributed(df: org.apache.spark.sql.DataFrame, arrCol: String,
      outCol: String, order: Seq[org.apache.spark.sql.Column],
      half1: Long, half2: Long, nRows: Long): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val k = 21
    val ai = df.schema.fieldIndex(arrCol)
    // range-partitioned global sort; zipWithIndex pins each row's global
    // position without funneling the frame into one task. Cached: the
    // totals pass, the cum pass and the output all read it (RDD caches
    // are released by the ContextCleaner once unreferenced).
    val sortedRdd = df.orderBy(order: _*).rdd.zipWithIndex
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      .cache()
    val idxField = df.schema.length
    // pass 1: per-partition elementwise totals → tiny driver table
    val partTotals = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val tot = new Array[Double](k)
      it.foreach { r =>
        val a = r.getSeq[Double](ai); var i = 0
        while (i < k) { tot(i) += a(i); i += 1 }
      }
      Iterator((pid, tot))
    }.collect().sortBy(_._1)
    val offsets: Map[Int, Array[Double]] = {
      val run = new Array[Double](k)
      partTotals.map { case (pid, tot) =>
        val before = run.clone(); var i = 0
        while (i < k) { run(i) += tot(i); i += 1 }
        pid -> before
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: (global idx, global prefix-sum array) rows
    val cumRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        val a = r.getSeq[Double](ai); var i = 0
        while (i < k) { run(i) += a(i); i += 1 }
        Row(r.getLong(idxField), run.clone().toSeq)
      }
    }
    val cumSchema = StructType(Seq(
      StructField("__cidx", LongType), StructField("__cumv", ArrayType(DoubleType))))
    val withIdxDf = spark.createDataFrame(sortedRdd, df.schema.add("__idx", LongType))
    val cumDf = spark.createDataFrame(cumRdd, cumSchema)
    // boundary cumulatives via two equi-joins on the position key:
    // upper = cum[min(idx+h2, n-1)], lower = cum[idx-h1-1] (absent ⇒ 0)
    val upper = cumDf.select(col("__cidx").as("__uidx"), col("__cumv").as("__cumU"))
    val lower = cumDf.select(col("__cidx").as("__lidx"), col("__cumv").as("__cumL"))
    val lo = greatest(col("__idx") - half1, lit(0L))
    val hi = least(col("__idx") + half2, lit(nRows - 1))
    val cnt = (hi - lo + 1).cast("double")
    val avgCols = (0 until k).map { i =>
      (col("__cumU")(i) - coalesce(col("__cumL")(i), lit(0.0))) / cnt
    }
    withIdxDf
      .join(upper, least(col("__idx") + half2, lit(nRows - 1)) === col("__uidx"))
      .join(lower, col("__idx") - half1 - 1 === col("__lidx"), "left")
      .withColumn(outCol, array(avgCols: _*))
      .drop("__idx", "__uidx", "__cumU", "__lidx", "__cumL")
  }

  /** edgeR exactTestDoubleTail for one gene on pseudo counts; beta
    * approximation above bigCount keeps this O(1) for huge totals. */
  def exactTestDoubleTail(y1: Array[Double], y2: Array[Double], disp: Double,
      bigCount: Double = 900.0): Double = {
    import SpecialFunctions._
    val n1 = y1.length
    val n2 = y2.length
    val s1 = math.round(y1.sum).toDouble
    val s2 = math.round(y2.sum).toDouble
    val s = s1 + s2
    if (s <= 0.0) return 1.0
    val ntot = n1 + n2
    val mu = s / ntot
    val mu1 = n1 * mu
    val mu2 = n2 * mu
    if (disp <= 1e-12) {
      // Poisson limit = conditional binomial double tail
      val p = n1.toDouble / ntot
      val obs = dbinomLog(s1, s, p)
      var tail = 0.0
      var x = 0.0
      while (x <= s) {
        val px = dbinomLog(x, s, p)
        if (px <= obs + 1e-12) tail += math.exp(px)
        x += 1.0
      }
      return math.min(tail, 1.0)
    }
    if (s1 > bigCount && s2 > bigCount) {
      // beta approximation: conditional on s, s1/s ≈ Beta(n1/disp, n2/disp)
      val a = n1 / disp
      val b = n2 / disp
      val pLeft = regBeta((s1 + 0.5) / s, a, b)
      val pRight = 1.0 - regBeta((s1 - 0.5) / s, a, b)
      return math.min(2.0 * math.min(pLeft, pRight), 1.0)
    }
    val size1 = n1 / disp
    val size2 = n2 / disp
    val pBotLog = dnbinomLog(s, ntot / disp, s)
    if (s1 < mu1) {
      var acc = 0.0
      var x = 0.0
      while (x <= s1) {
        acc += math.exp(dnbinomLog(x, size1, mu1) + dnbinomLog(s - x, size2, mu2) - pBotLog)
        x += 1.0
      }
      math.min(2.0 * acc, 1.0)
    } else if (s1 > mu1) {
      var acc = 0.0
      var x = s1
      while (x <= s) {
        acc += math.exp(dnbinomLog(x, size1, mu1) + dnbinomLog(s - x, size2, mu2) - pBotLog)
        x += 1.0
      }
      math.min(2.0 * acc, 1.0)
    } else 1.0
  }

  private def dbinomLog(x: Double, n: Double, p: Double): Double =
    Gamma.lgamma(n + 1.0) - Gamma.lgamma(x + 1.0) - Gamma.lgamma(n - x + 1.0) +
      x * math.log(p) + (n - x) * math.log1p(-p)

  /** edgeR aveLogCPM: one-group NB fit with prior.count=2 (lib-scaled)
    * and dispersion 0.05, reported as log2 CPM. */
  def aveLogCpm(y: Array[Double], effLib: Array[Double],
      priorCount: Double = 2.0, dispersion: Double = 0.05): Double = {
    val meanLib = effLib.sum / effLib.length
    val prior = effLib.map(l => priorCount * l / meanLib)
    val yAug = Array.tabulate(y.length)(j => y(j) + prior(j))
    val off = Array.tabulate(y.length)(j => math.log(effLib(j) + 2.0 * prior(j)))
    val beta = mglmOneGroup(yAug, off, dispersion)
    (beta + math.log(1e6)) / math.log(2.0)
  }

  /** exactTest logFC: per-condition abundances with prior.count=0.125
    * (lib-scaled) at the gene's tagwise dispersion; log2(A) - log2(B). */
  def exactLogFc(y: Array[Double], groupOf: Array[Int], effLib: Array[Double],
      disp: Double, priorCount: Double = 0.125): Double = {
    val meanLib = effLib.sum / effLib.length
    def abundance(g: Int): Double = {
      val idx = (0 until y.length).filter(groupOf(_) == g).toArray
      val yAug = idx.map(j => y(j) + priorCount * effLib(j) / meanLib)
      val off = idx.map(j => math.log(effLib(j) + 2.0 * priorCount * effLib(j) / meanLib))
      mglmOneGroup(yAug, off, disp)
    }
    (abundance(0) - abundance(1)) / math.log(2.0)
  }
}

/** EdgeR_Unpaired (differential.py:51-150): TMM normalization, qCML
  * dispersion estimation, exact NB test A-vs-B, BH FDR — emits
  * `log2FC/logCPM/p/FDR (<comparison>)` columns aligned to the index.
  *
  * Distribution: sample-axis statistics (library sizes, TMM factors) are
  * small driver aggregates; every per-gene kernel is map-side; the
  * dispersion trend is a moving average over an AveLogCPM-ordered window
  * (width = span·n, sublinear in n per the edgeR span rule); FDR uses the
  * two-window BH formulation.
  *
  * Divergence note (documented): the reference runs `estimateDisp`
  * with `robust=TRUE` and locfit trend; we implement the movingave trend
  * and estimate prior.df empirically by moment-matching the deviance-
  * residual variances (limma fitFDist with winsorized moments when
  * robust — a global approximation of fitFDistRobustly's per-gene
  * prior) — tagwise values agree closely but not to 1e-5; the
  * exact-test kernel itself reproduces R exactly given R's dispersions
  * (EdgeRSpec pins this with inverted golden dispersions).
  */
final case class EdgeRUnpaired(
    conditionA: String,
    conditionB: String,
    conditionToColumns: Map[String, Seq[String]],
    comparisonName: Option[String] = None,
    librarySizes: Option[Seq[Double]] = None,
    manualDispersionValue: Double = 0.4,
    robust: Boolean = true,
    priorDf: Double = 20.0,
    index: String = "gene_stable_id") extends Transformer {

  val name = "EdgeR_Unpaired"
  override val suffix: Option[String] =
    Some(" (" + comparisonName.getOrElse(name) + ")")

  val columnsA: Seq[String] = conditionToColumns(conditionA)
  val columnsB: Seq[String] = conditionToColumns(conditionB)

  def logFCColumn: String = "log2FC" + suffix.get
  def pColumn: String = "p" + suffix.get
  def fdrColumn: String = "FDR" + suffix.get
  def logCPMColumn: String = "logCPM" + suffix.get
  def columns: Seq[String] = Seq(logFCColumn, pColumn, fdrColumn, logCPMColumn)

  def apply(df: DataFrame): DataFrame = run(df, keepFit = false)

  /** [[apply]] plus the per-gene exact-test inputs — `__s1`/`__s2`
    * (rounded pseudo-count sums per condition) and `__disp` (tagwise
    * dispersion): given these, the NB double-tail p-value and the BH
    * FDR are closed-form (lgamma sums), so an external engine can
    * replay them (the partial-oracle pattern — the iterative qCML /
    * trend / prior machinery stays spec-pinned). */
  def applyWithFit(df: DataFrame): DataFrame = run(df, keepFit = true)

  private def run(df: DataFrame, keepFit: Boolean): DataFrame = {
    import EdgeRKernel._
    val cols = columnsA ++ columnsB
    val nA = columnsA.length
    val groupOf: Array[Int] = Array.tabulate(cols.length)(j => if (j < nA) 0 else 1)

    // cache the narrow (index + selected samples) projection: TMM factor
    // estimation, the grid-likelihood agg, the trend windows and the BH
    // passes each trigger an action — without this the full upstream plan
    // (often an expensive aggregation) re-executes per action. Scratch
    // cache: dead once `tested` materializes, unpersisted below.
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val proj = df.select((index +: cols).map(col(_)): _*).cache()
    scratch += proj
    try {

    // samples axis: library sizes + TMM factors (driver-side smalls,
    // one shared aggregation + one count on the cached projection)
    val (libComputed, factors) = Normalization.tmmAndLib(proj, cols)
    val lib: Map[String, Double] = librarySizes match {
      case Some(ls) => cols.zip(ls.map(_.toDouble)).toMap
      case None => libComputed
    }
    val effLib: Array[Double] = cols.map(c => lib(c) * factors(c)).toArray
    val commonLib = math.exp(effLib.map(math.log).sum / effLib.length)
    val nGroups = 2

    val yArr = array(cols.map(c => coalesce(col(c).cast("double"), lit(0.0))): _*)
    val base = proj.select(col(index), yArr.as("y"))

    // covariate for the dispersion trend: aveLogCPM at the default 0.05
    val aveUdf = udf((y: Seq[Double], d: Double) => aveLogCpm(y.toArray, effLib, 2.0, d))
    val singleReplicate = nA == 1 && columnsB.length == 1

    val withDisp: DataFrame =
      if (singleReplicate) {
        // differential.py:132-135: dispersion = manual² without replicates;
        // reported logCPM keeps the default 0.05 dispersion
        base.withColumn("logcpm_out", aveUdf(col("y"), lit(0.05)))
          .withColumn("disp", lit(manualDispersionValue * manualDispersionValue))
      } else {
        val l0Udf = udf((y: Seq[Double], d: Double) =>
          l0Grid(pseudoCounts(y.toArray, groupOf, nGroups, effLib, commonLib, d),
            groupOf, nGroups))
        // cache: the grid agg action and the final pass both need these
        // kernel columns; and the window stages below must read them from
        // storage, not re-run the UDFs single-threaded (see repartitions)
        val s1 = base
          .withColumn("avelogcpm", aveUdf(col("y"), lit(0.05)))
          .withColumn("l0", l0Udf(col("y"), lit(0.01)))
          .cache()
        scratch += s1

        // one small agg: gene count + the 21 summed log-likelihoods
        val aggRow = s1.agg(
          count(lit(1)).as("n"),
          (0 until 21).map(i => sum(col("l0")(i)).as(s"s$i")): _*).collect()(0)
        val nTags = aggRow.getAs[Long]("n")
        val commonDisp = maximizeGridDisp(Array.tabulate(21)(i => aggRow.getAs[Double](s"s$i")))

        val span = if (nTags > 10) math.pow(10.0 / nTags, 0.23) else 1.0
        val width = math.max(math.min(math.floor(span * nTags).toLong, nTags), 1L)
        val half1 = math.ceil((width - 1) / 2.0).toLong
        val half2 = math.floor((width - 1) / 2.0).toLong
        // AveLogCPM-ordered moving average (edgeR movingAverageByCol).
        // Single-range window: acceptable because width is sublinear; the
        // orderBy shuffles once on the double key.
        // Moving average along the AveLogCPM order via PREFIX-SUM
        // differencing (exactly edgeR movingAverageByCol's own cumsum
        // formulation): a naive sliding `avg().over(rowsBetween(-h1,h2))`
        // is O(n·width) in Spark (no retractable aggregates — the frame
        // re-aggregates per row; 66s single-threaded at sf0.1), while
        // cumsum/lead/lag frames are all O(n). Each window stage computes
        // only these cheap passes and is followed by a repartition so the
        // expensive per-gene kernels fan back out across all cores (an
        // un-partitioned Window otherwise pins everything downstream of
        // it into ONE task).
        val maxUdf = udf((ll: Seq[Double]) => maximizeGridDisp(ll.toArray))
        val s2base = EdgeRKernel.movingAvgArray(s1, "l0", "m0",
          Seq(col("avelogcpm"), col(index)), half1, half2, nTags)
          .repartition(col(index))
          .withColumn("trend_disp", maxUdf(col("m0")))
          .withColumn("l02", l0Udf(col("y"), col("trend_disp")))
        // cache when anything makes a second pass over this stage:
        // robust=TRUE adds the prior-df quantile + moments aggregations,
        // and the distributed moving average (past the cutoff) launches a
        // partition-sizing job plus the totals pass before its own cache
        // exists — uncached, the expensive l0 re-grid would execute twice
        val s2 =
          if (robust || nTags > MovingAvgWindowCutoff) {
            val c = s2base.cache(); scratch += c; c
          } else s2base
        // tagwise: maximize l02 + prior.n · m0' (m0' = moving avg of l02).
        // prior.n comes from the empirical prior.df (estimateDisp's
        // prior.df=NULL default): per-gene deviance-residual variances at
        // the trended dispersion, moment-matched to a scaled F on the log
        // scale (limma fitFDist; Chen, Lun & Smyth 2014). robust=TRUE
        // winsorizes the moments at the (5%, 90%) e-quantiles — a global
        // approximation of fitFDistRobustly, which additionally relaxes
        // the prior per-gene for individual outliers (documented
        // divergence). On heterogeneous data the estimate collapses toward
        // zero (matching R on the reference golden frame — EdgeRSpec); on
        // consistent data it recovers the usual prior.df ≈ 10–20 range.
        val priorN =
          if (!robust) priorDf / (cols.length - nGroups).toDouble
          else {
            val statUdf = udf((y: Seq[Double], d: Double) =>
              priorDfStat(y.toArray, groupOf, nGroups, effLib, d))
            // cache the 2-double projection: the quantile pass and the
            // moments pass inside fitFDistDf2 would otherwise each re-run
            // the per-gene NB fits
            val eDf = s2.select(statUdf(col("y"), col("trend_disp")).as("es"))
              .where(col("es").isNotNull)
              .select(col("es")(0).as("e"), col("es")(1).as("tri"))
              .cache()
            scratch += eDf
            fitFDistDf2(eDf, winsorize = true) / (cols.length - nGroups).toDouble
          }
        val tagUdf = udf((l: Seq[Double], m: Seq[Double]) =>
          maximizeGridDisp(Array.tabulate(21)(i => l(i) + priorN * m(i))))
        EdgeRKernel.movingAvgArray(s2, "l02", "m0p",
          Seq(col("avelogcpm"), col(index)), half1, half2, nTags)
          .repartition(col(index))
          .withColumn("disp", tagUdf(col("l02"), col("m0p")))
          // reported logCPM: aveLogCPM at the estimated common dispersion
          // (edgeR estimateDisp refreshes AveLogCPM; pinned by the golden
          // logCPM values at 1e-5 — EdgeRSpec)
          .withColumn("logcpm_out", aveUdf(col("y"), lit(commonDisp)))
          .drop("l0", "m0", "l02", "m0p", "trend_disp", "avelogcpm")
      }

    val testUdf = udf((y: Seq[Double], d: Double) => {
      val ya = y.toArray
      val pseudo = pseudoCounts(ya, groupOf, nGroups, effLib, commonLib, d)
      val p1 = (0 until nA).map(pseudo(_)).toArray
      val p2 = (nA until cols.length).map(pseudo(_)).toArray
      val p = exactTestDoubleTail(p1, p2, d)
      val lfc = exactLogFc(ya, groupOf, effLib, d)
      // rounded pseudo sums, exactly as exactTestDoubleTail forms them —
      // emitted for the partial oracle's external p-value replay
      Array(lfc, p, math.round(p1.sum).toDouble, math.round(p2.sum).toDouble)
    })

    // cache before BH: the distributed FDR makes several passes (count,
    // ranked sort, partition-minima collect) — the exact-test kernel must
    // run once, not once per pass. The returned plan reads this cache, so
    // it outlives apply under CacheScope's bounded retention.
    val fitCols =
      if (keepFit) Seq(col("res")(2).as("__s1"), col("res")(3).as("__s2"),
        col("disp").as("__disp"))
      else Nil
    val tested = graft.core.CacheScope.retain(withDisp
      .withColumn("res", testUdf(col("y"), col("disp")))
      .select(Seq(col(index),
        col("res")(0).as(logFCColumn),
        col("logcpm_out").as(logCPMColumn),
        col("res")(1).as("p_raw")) ++ fitCols: _*))

    BhFdr.adjustDistributed(tested, "p_raw", fdrColumn)
      .withColumnRenamed("p_raw", pColumn)
      .select(Seq(col(index), col(logFCColumn), col(pColumn), col(fdrColumn),
        col(logCPMColumn)) ++ (if (keepFit)
          Seq(col("__s1"), col("__s2"), col("__disp")) else Nil): _*)
    } finally {
      // adjustDistributed's count() materialized `tested`; the scratch
      // caches (proj, s1) are dead from here even if we threw mid-way
      scratch.foreach(_.unpersist(blocking = false))
    }
  }
}
