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
    index: String = "gene_stable_id") extends Transformer {

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

    val normed = zeroed.select(
      (col(index) +: dataCols.map(c => (col(c) * lit(scales(c))).as(c))): _*)

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
