package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** Elementwise / impute / scale transforms (reference SURVEY.md §2.4, §2.9).
  *
  * All operators follow the reference convention that the semantic row index
  * (e.g. "gene_stable_id") is an ordinary column named in `protect`: value
  * transforms never touch protected columns.
  */
object Transforms {

  /** Numeric value columns of `df` minus the protected ones. */
  def numericValueColumns(df: DataFrame, protect: Seq[String]): Seq[String] =
    df.schema.fields.toSeq
      .filter(f => f.dataType.isInstanceOf[NumericType] && !protect.contains(f.name))
      .map(_.name)
}

/** Replace a fixed missing value with a replacement (reference:
  * src/mdataframe/mdataframe.py:90-103 `ImputeFixed`; default NaN→0).
  * In Spark both SQL NULL and NaN count as "missing" when `missingValue`
  * is NaN/null, matching pandas' NaN semantics. */
final case class ImputeFixed(
    missingValue: Option[Double] = None, // None = NaN/NULL
    replacementValue: Double = 0.0,
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {
  val name = s"Im($missingValue$replacementValue)"

  def apply(df: DataFrame): DataFrame = {
    val cols = Transforms.numericValueColumns(df, protect)
    missingValue match {
      case None =>
        val filled = df.na.fill(replacementValue, cols)
        // na.fill covers NULL; nanvl covers NaN (pandas has a single NaN)
        filled.withColumns(
          cols.map(c => c -> nanvl(col(c).cast("double"), lit(replacementValue))).toMap)
      case Some(mv) =>
        df.na.replace(cols, Map(mv -> replacementValue))
    }
  }
}

/** Per-column mean/median/most_frequent imputation (reference:
  * mdataframe.py:106-124 `ImputeMeanMedian`, sklearn Imputer semantics).
  *
  * Statistics are computed in ONE distributed aggregation pass and injected
  * as literals: mean uses exact decimal summation (order-independent →
  * deterministic across engines/partitionings), median uses Spark's exact
  * `percentile` (linear interpolation, matching numpy/DuckDB `median`),
  * most_frequent takes the smallest value among modes (sklearn tie rule). */
final case class ImputeStrategy(
    strategy: String = "mean",
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {
  require(Seq("mean", "median", "most_frequent").contains(strategy),
    s"Wrong strategy, allowed is mean, median and most_frequent, was $strategy.")
  val name = s"Im(nan0$strategy)"

  def apply(df: DataFrame): DataFrame = {
    val cols = Transforms.numericValueColumns(df, protect)
    if (cols.isEmpty) return df
    if (strategy == "most_frequent") {
      // mode per column in ONE distributed pass (a per-column
      // groupBy/limit/collect loop would run S sequential jobs): explode
      // to narrow (column, value) rows, count, then per-column argmax.
      // min(struct(-n, v)) = largest count, smallest value on ties, with
      // NaN losing ties to numbers — the same order desc(n)/asc(value)
      // yields (Spark sorts NaN above every double).
      val pairs = df.select(explode(array(cols.map(c =>
          struct(lit(c).as("c"), col(c).cast("double").as("v"))): _*)).as("e"))
        .select(col("e.c").as("c"), col("e.v").as("v"))
        .where(col("v").isNotNull)
      val best = pairs.groupBy("c", "v").agg(count(lit(1)).as("n"))
        .groupBy("c").agg(min(struct(negate(col("n")), col("v"))).as("b"))
        .select(col("c"), col("b.v").as("v"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // all-null columns have no pair rows: fill 0.0 as before
      df.na.fill(cols.map(c => c -> best.getOrElse(c, 0.0)).toMap)
    } else {
      // exact median buffers every value in one reduce task; switch to
      // the approx aggregate past the shared cutoff (one cheap count —
      // mean imputation needs no count and skips it)
      lazy val exactMedian =
        df.count() <= graft.functions.Normalization.ExactPercentileCutoff
      val aggs = cols.map { c =>
        strategy match {
          case "mean" =>
            (sum(col(c).cast(DecimalType(28, 10))).cast("double") /
              count(col(c))).as(c)
          case "median" =>
            graft.functions.Normalization.scalablePercentile(col(c), 0.5, exactMedian).as(c)
        }
      }
      val stats = df.agg(aggs.head, aggs.tail: _*)
      // broadcast the 1-row stats frame so the fill stays one lazy plan
      val joined = df.crossJoin(broadcast(stats.select(cols.map(c => col(c).as(s"__stat_$c")): _*)))
      val filled = joined.withColumns(
        cols.map(c => c -> coalesce(
          nanvl(col(c).cast("double"), lit(null).cast("double")),
          col(s"__stat_$c").cast("double"))).toMap)
      filled.drop(cols.map(c => s"__stat_$c"): _*)
    }
  }
}

/** Z-score standardization (reference: mdataframe.py:146-157 `ZScaler` with
  * `ddof=1`; mdataframe.py:760-763 default `MDF.scale()` = sklearn
  * `preprocessing.scale` with population std `ddof=0`).
  *
  *   - `axis=0`: standardize each value column over all rows (the
  *     distributed dimension) — one aggregation pass computing exact
  *     sum/sumsq moments, then a map-side select. No shuffle beyond the agg.
  *   - `axis=1`: standardize each row across the value columns — pure
  *     row-local expressions, no shuffle at all.
  *
  * Moments use sum/sum-of-squares rather than Spark's streaming
  * `stddev_samp` so results are reproducible for exactly-representable
  * inputs (e.g. counts) regardless of partitioning/order.
  * Constant columns/rows map to 0 (mdataframe.py:152 guard). */
final case class ZScale(
    axis: Int = 0,
    ddof: Int = 1,
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {
  val name = "Z"

  def apply(df: DataFrame): DataFrame = {
    val cols = Transforms.numericValueColumns(df, protect)
    require(cols.nonEmpty, "ZScale needs at least one numeric value column")
    if (axis == 0) {
      val stats = df.agg(
        count(lit(1)).as("__n"),
        cols.flatMap(c => Seq(
          sum(col(c).cast("double")).as(s"__s_$c"),
          sum(col(c).cast("double") * col(c).cast("double")).as(s"__q_$c"),
          max(col(c).cast("double")).as(s"__mx_$c"),
          min(col(c).cast("double")).as(s"__mn_$c"))): _*)
      val joined = df.crossJoin(broadcast(stats))
      val n = col("__n").cast("double")
      val out = joined.withColumns(cols.map { c =>
        val mean = col(s"__s_$c") / n
        val varcol = (col(s"__q_$c") - col(s"__s_$c") * col(s"__s_$c") / n) / (n - lit(ddof.toDouble))
        c -> when(col(s"__mx_$c") === col(s"__mn_$c"), lit(0.0))
          .otherwise((col(c).cast("double") - mean) / sqrt(varcol))
      }.toMap)
      out.drop(out.columns.filter(_.startsWith("__")): _*)
    } else {
      val xs = cols.map(c => col(c).cast("double"))
      val n = lit(cols.size.toDouble)
      val s = xs.reduce(_ + _)
      val q = xs.map(x => x * x).reduce(_ + _)
      val mean = s / n
      val varExpr = (q - s * s / n) / (n - lit(ddof.toDouble))
      val mx = greatest(xs: _*)
      val mn = least(xs: _*)
      df.withColumns(cols.map { c =>
        c -> when(mx === mn, lit(0.0))
          .otherwise((col(c).cast("double") - mean) / sqrt(varExpr))
      }.toMap)
    }
  }
}

/** The reference's generic elementwise transform surface (reference:
  * mdataframe.py:489-676 `MDF.transform` / E1): accepts either a whitelisted
  * method name (the Spark analog of "any pandas method name string"), with
  * positional args, or an arbitrary `Column => Column` lambda (the analog of
  * a Python callable — but expression-level, so it stays inside codegen). */
final case class Elementwise(
    method: String,
    args: Seq[Any] = Seq.empty,
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {
  import Elementwise._
  require(Whitelist.contains(method),
    s"Don't know how to apply this transformation: $method.")
  val name = method

  def apply(df: DataFrame): DataFrame = {
    val f = compile(method, args)
    val cols = Transforms.numericValueColumns(df, protect)
    df.withColumns(cols.map(c => c -> f(col(c))).toMap)
  }
}

object Elementwise {
  /** Whitelisted method names → Column functions (the expression-expressible
    * subset of pandas' method surface the reference exposes by string). */
  val Whitelist: Set[String] = Set(
    "abs", "log", "log2", "log10", "log1p", "exp", "sqrt", "round",
    "fillna", "clip", "add", "sub", "mul", "div", "pow", "neg", "rank")

  private def d(a: Any): Double = a match {
    case n: Number => n.doubleValue()
    case other     => other.toString.toDouble
  }

  def compile(method: String, args: Seq[Any]): Column => Column = method match {
    case "abs"    => abs(_)
    case "log"    => c => log(c)
    case "log2"   => c => log2(c)
    case "log10"  => c => log10(c)
    case "log1p"  => c => log1p(c)
    case "exp"    => c => exp(c)
    case "sqrt"   => c => sqrt(c)
    case "neg"    => c => negate(c)
    case "round"  => c => round(c, if (args.isEmpty) 0 else d(args.head).toInt)
    case "fillna" => c => coalesce(nanvl(c.cast("double"), lit(null)), lit(d(args.head)))
    case "clip"   => c => least(greatest(c, lit(d(args.head))), lit(d(args(1))))
    case "add"    => c => c + lit(d(args.head))
    case "sub"    => c => c - lit(d(args.head))
    case "mul"    => c => c * lit(d(args.head))
    case "div"    => c => c / lit(d(args.head))
    case "pow"    => c => pow(c, lit(d(args.head)))
    case "rank"   => c => c // rank needs a window; handled by SortDsl/W2
  }

  /** Arbitrary expression-level transform (the Python-callable analog). */
  def custom(opName: String, f: Column => Column,
      protect: Seq[String] = Seq("gene_stable_id")): Transformer =
    Transformer(opName, Seq(opName)) { df =>
      val cols = Transforms.numericValueColumns(df, protect)
      df.withColumns(cols.map(c => c -> f(col(c))).toMap)
    }
}

/** Column renames (reference P3: R-safe renames transformations.py:115-118,
  * suffix machinery transformations.py:52-57, stat renames
  * differential.py:107-117). */
object Rename {
  /** R-safe: prefix "X", "-" → "." (transformations.py:115-118). */
  def rSafe(df: DataFrame, protect: Seq[String] = Seq("gene_stable_id")): DataFrame =
    df.toDF(df.columns.toSeq.map(c =>
      if (protect.contains(c)) c else "X" + c.replace("-", ".")): _*)

  def suffix(df: DataFrame, sfx: String, protect: Seq[String]): DataFrame =
    df.toDF(df.columns.toSeq.map(c => if (protect.contains(c)) c else c + sfx): _*)

  def mapped(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)
}
