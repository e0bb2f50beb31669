package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of modern
  * pretraining pipelines (FineWeb-Edu / DCLM shape: fit a small linear
  * classifier on labeled examples, score every document map-side, keep
  * the high-scoring slice). The reference pipeline has no counterpart;
  * this is a §2.13 training-data extension like `QualityLm`.
  *
  * The model is logistic regression over three engine-replayable text
  * features (whitespace token count, stopword ratio, mean token
  * length — all exact rationals of integers, so an external SQL engine
  * recomputes them bit-for-bit). Fitting is Newton/IRLS with ridge
  * regularization, run DISTRIBUTED but DETERMINISTIC:
  *
  *  - each iteration aggregates the 4×4 weighted Gram matrix Xᵀ S X
  *    and gradient Xᵀ(y−p) in ONE pass with map-side partial combine
  *    (14 scalar sums — bounded driver state, any corpus size);
  *  - every summed term is cast to exact decimal first
  *    ([[graft.Tables.dsum]]), so the aggregate is
  *    partitioning-invariant — the fitted weights are a pure function
  *    of the data, not of the cluster layout (same discipline as the
  *    layout-invariant IVF quantizer fit);
  *  - the iteration count is FIXED (default 8), not
  *    convergence-gated, so the job graph and the result are
  *    reproducible run to run;
  *  - the 4×4 Newton system solves driver-side by Gaussian
  *    elimination with partial pivoting (deterministic, no BLAS).
  *
  * Scoring is a codegen'd scalar expression (w·x + b, optionally
  * squashed); at 100 TB the fit cost is `iters` aggregate passes over
  * three narrow doubles and scoring is map-side — no shuffle anywhere.
  *
  * Cross-engine note: the linear score [[Model.linearScore]] is plain
  * arithmetic and replays exactly in SQL; the sigmoid itself uses
  * `exp`, whose last-ulp behavior is engine-specific — gate queries
  * compare η (and the decision, which is η ≥ 0 ⇔ p ≥ ½ by
  * monotonicity), keeping the oracle transcendental-free.
  */
object QualityClassifier {

  val FeatureNames: Seq[String] = Seq("n_tokens", "stopword_ratio", "mean_token_len")

  /** The three replayable features, in [[FeatureNames]] order. */
  def features(c: Column): Seq[Column] = Seq(
    TextFunctions.tokenCount(c).cast("double"),
    TextFunctions.stopwordRatio(c),
    TextFunctions.meanTokenLength(c))

  final case class Model(weights: Seq[Double], intercept: Double) {
    require(weights.length == FeatureNames.length)

    /** η = b + w·x — exact arithmetic, SQL-replayable. */
    def linearScore(c: Column): Column =
      features(c).zip(weights).foldLeft(lit(intercept): Column) {
        case (acc, (f, w)) => acc + f * lit(w)
      }

    /** p = σ(η) in (0,1). Monotone in η, so thresholding p at ½ is
      * thresholding η at 0 — use η when an external engine must agree
      * bit-for-bit. */
    def score(c: Column): Column =
      lit(1.0) / (lit(1.0) + exp(-linearScore(c)))

    /** One row per parameter (FeatureNames + `__intercept`) — the
      * oracle-side export shape. */
    def toFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (FeatureNames.zip(weights) :+ ("__intercept", intercept))
        .toDF("feature", "weight")
    }
  }

  /** Fit by ridge-regularized IRLS on (textCol, labelCol ∈ {0,1}).
    * Null text contributes all-zero features (every feature guards its
    * empty case); null labels are dropped. */
  def fit(df: DataFrame, textCol: String, labelCol: String,
      iters: Int = 8, ridge: Double = 0.1): Model = {
    require(iters > 0, "iters must be positive")
    require(ridge >= 0, "ridge must be non-negative")
    val d = FeatureNames.length + 1 // + intercept at index 0
    val fcols = features(col(textCol))
    val input = graft.core.CacheScope.retain(
      df.where(col(labelCol).isNotNull)
        .select((col(labelCol).cast("double").as("y") +:
          fcols.zipWithIndex.map { case (f, i) => coalesce(f, lit(0.0)).as(s"f$i") }): _*))
    // an all-null-label frame would otherwise surface as null aggregate
    // cells → 0.0 → the misleading "singular IRLS system" error
    require(input.head(1).nonEmpty,
      s"QualityClassifier.fit: no labeled rows ($labelCol is null everywhere)")
    val x: Seq[Column] = lit(1.0) +: FeatureNames.indices.map(i => col(s"f$i"))

    val w = Array.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val eta = x.zipWithIndex.map { case (xi, i) => xi * lit(w(i)) }
        .reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      val s = p * (lit(1.0) - p)
      val g = col("y") - p
      // upper triangle of XᵀSX + the gradient, one combined aggregate;
      // decimal terms (scale 6) make the sums order-independent. Width
      // 38, not 18: a quadratic term (s·n_tokens²) on a multi-million-
      // token document exceeds 12 integer digits, and an overflowing
      // cast under ANSI-off yields NULL — silently dropping the row
      val aggs =
        (for { i <- 0 until d; j <- i until d }
          yield graft.Tables.dsumWide(s * x(i) * x(j), 6).as(s"a_${i}_$j")) ++
        (0 until d).map(i => graft.Tables.dsumWide(g * x(i), 6).as(s"g_$i"))
      val row = input.agg(aggs.head, aggs.tail: _*).head()
      val a = Array.ofDim[Double](d, d)
      for { i <- 0 until d; j <- i until d } {
        val v = row.getAs[Double](s"a_${i}_$j")
        a(i)(j) = v; a(j)(i) = v
      }
      val grad = Array.tabulate(d)(i => row.getAs[Double](s"g_$i"))
      // ridge on the weight block (not the intercept): Hessian + λI,
      // gradient − λw
      for (i <- 1 until d) {
        a(i)(i) += ridge
        grad(i) -= ridge * w(i)
      }
      val delta = solve(a, grad)
      for (i <- 0 until d) w(i) += delta(i)
    }
    Model(w.drop(1).toSeq, w(0))
  }

  /** Gaussian elimination with partial pivoting — d is 4, determinism
    * matters more than speed. Mutates copies, not the inputs. */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    for (k <- 0 until n) {
      var piv = k
      for (i <- k + 1 until n) if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i
      if (piv != k) { val t = a(k); a(k) = a(piv); a(piv) = t
        val tb = b(k); b(k) = b(piv); b(piv) = tb }
      require(math.abs(a(k)(k)) > 1e-12,
        "singular IRLS system — degenerate features (constant column?); raise ridge")
      for (i <- k + 1 until n) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until n) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val xs = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s -= a(i)(j) * xs(j)
      xs(i) = s / a(i)(i)
    }
    xs
  }
}
