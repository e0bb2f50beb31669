package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's predicate mini-language (reference:
  * src/mdataframe/filter.py:8-139). A filter is a list of clauses, each
  * `(columns, operator, argument[, atLeast])`:
  *
  *   - operators: `>` `<` `>=` `<=` (threshold), `|>` (abs-greater),
  *     `in` / `notin` (set membership) — filter.py:19-27;
  *   - a clause may apply to several columns; the operator may carry a
  *     quantifier prefix parsed by `^([\d,a]?)([<>=]+)$` (filter.py:18):
  *     `"a>"` = ALL columns must satisfy, `"2>="` = at least 2 must
  *     (filter.py:71-83). Default quantifier is "at least 1";
  *   - clauses AND-compose (index intersection, filter.py:134-139).
  *
  * Instead of materializing surviving row-index sets per clause like the
  * reference, every clause compiles to a single Catalyst `Column` predicate:
  * the k-of-n quantifier becomes a sum of int-cast booleans, and the whole
  * filter is one `df.filter(...)` that Catalyst pushes into the scan.
  *
  * Null semantics follow pandas: comparisons and `isin` on NaN are false
  * (row dropped), while `notin` (`~isin`) on NaN is TRUE (row kept) —
  * replicated with explicit `coalesce`.
  */
final case class FilterClause(
    columns: Seq[String],
    op: String,
    arg: Any,
    atLeastOpt: Option[String] = None) {

  import FilterClause._

  /** (base operator, quantifier) — filter.py:36-52. */
  val (baseOp: String, atLeast: String) =
    if (Lookup.contains(op)) (op, atLeastOpt.getOrElse("1"))
    else
      OpPattern.findFirstMatchIn(op) match {
        case Some(m) =>
          val base = m.group(2)
          if (!Lookup.contains(base))
            throw new IllegalArgumentException(s"The operator '$op' is not valid.")
          (base, Option(m.group(1)).filter(_.nonEmpty).getOrElse("1"))
        case None =>
          throw new IllegalArgumentException(s"The operator '$op' is not valid.")
      }
  if (atLeast != "a" && !atLeast.forall(_.isDigit))
    throw new IllegalArgumentException(s"Don't know how to aggregate '$atLeast'.")

  private def elem(c: Column): Column = baseOp match {
    case "|>"    => abs(c) > lit(arg)
    case ">"     => c > lit(arg)
    case "<"     => c < lit(arg)
    case ">="    => c >= lit(arg)
    case "<="    => c <= lit(arg)
    case "in"    => c.isin(values: _*)
    case "notin" => !coalesce(c.isin(values: _*), lit(false))
  }

  private def values: Seq[Any] = arg match {
    case s: Seq[_] => s
    case other     => Seq(other)
  }

  /** Compile to one boolean Column (replaces filter.py:54-83's
    * per-clause index materialization).
    *
    * Null handling: pandas comparisons yield False on NaN, so NaN rows
    * never survive (filter.py:85-118). In a WHERE (or OR-combined)
    * context SQL's NULL propagates to "row dropped" — the same outcome —
    * so plain predicates suffice and stay PUSHDOWN-TRANSLATABLE (a
    * `coalesce(pred, false)` wrapper blocks parquet predicate pushdown
    * entirely). Only the k-of-n SUM needs an explicit null→false
    * coalesce, where a NULL term would otherwise nullify the whole sum
    * instead of counting 0. */
  def compile: Column = {
    atLeast match {
      case "a" => columns.map(c => elem(col(c))).reduce(_ && _)
      case "1" if columns.sizeIs == 1 => elem(col(columns.head))
      case k => columns
        .map(c => coalesce(elem(col(c)), lit(false)).cast("int"))
        .reduce(_ + _) >= k.toInt
    }
  }

  override def toString: String =
    s"(${columns.mkString("[", ",", "]")},$op,$arg${atLeastOpt.fold("")("," + _)})"
}

object FilterClause {
  private val OpPattern = "^([\\d,a]?)([<>=]+)$".r
  private val Lookup = Set("|>", ">", "<", ">=", "<=", "in", "notin")

  /** Tuple sugar mirroring the reference call shape
    * `Filter([("log", "|>", 1), (["a","b"], "2>=", 5)])`. */
  def of(t: (Any, String, Any)): FilterClause = t._1 match {
    case s: String   => FilterClause(Seq(s), t._2, t._3)
    case cs: Seq[_]  => FilterClause(cs.map(_.toString), t._2, t._3)
    case other       => throw new IllegalArgumentException(s"Bad columns: $other")
  }
}

/** Shared surface of [[Filter]] and [[CombinedFilter]] (filter.py:141-162):
  * `f1 & f2` intersects surviving rows, `f1 | f2` unions them. On a
  * unique index these are exactly predicate AND / OR, so combination stays
  * inside one Catalyst plan with no index materialization. */
sealed trait FilterLike extends Transformer {
  def predicate: Column
  def apply(df: DataFrame): DataFrame = df.filter(predicate)
  def &(other: FilterLike): FilterLike = CombinedFilter(this, other, "intersection")
  def |(other: FilterLike): FilterLike = CombinedFilter(this, other, "union")
}

final case class Filter(clauses: Seq[FilterClause]) extends FilterLike {
  require(clauses.nonEmpty, "Filter needs at least one clause")
  val name = "Filter"

  /** AND of all clauses (filter.py:134-139). */
  def predicate: Column = clauses.map(_.compile).reduce(_ && _)
}

object Filter {
  /** `Filter(("log","|>",1), (Seq("a","b"),"2>=",5))` */
  def apply(first: (Any, String, Any), rest: (Any, String, Any)*): Filter =
    new Filter((first +: rest).map(FilterClause.of))
}

final case class CombinedFilter(f1: FilterLike, f2: FilterLike, combineOperation: String)
    extends FilterLike {
  val name = "CombinedFilter"
  override protected def params = Seq(f1.fingerprint, f2.fingerprint, combineOperation)

  def predicate: Column = combineOperation match {
    case "union"        => f1.predicate || f2.predicate
    case "intersection" => f1.predicate && f2.predicate
    case other =>
      throw new IllegalArgumentException(
        s"Combine operation $other not supported.")
  }
}
