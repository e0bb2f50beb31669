package graft.operators

import graft.core.{MFrame, Transformer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One sort step: simultaneous multi-key `sort_values` (reference:
  * src/mdataframe/mdataframe.py:319-487 / O1-O2). `axis=0` sorts rows by
  * column values; `axis=1` reorders *columns* by the values in given rows.
  * Keys listed in `computed` sort by the given expression instead of a
  * stored column — the Scala analog of the reference's callable keys
  * (mdataframe.py:339-348). */
final case class SortStep(by: Seq[String], axis: Int = 0, ascending: Seq[Boolean] = Seq(true),
    computed: Map[String, Column] = Map.empty) {
  require(axis == 0 || axis == 1, s"No axis to sort: $axis.")
  def asc: Seq[Boolean] =
    if (ascending.size == by.size) ascending
    else if (ascending.size == 1) Seq.fill(by.size)(ascending.head)
    else throw new IllegalArgumentException(
      "If you supply a list of columns/rows to sort by, you must supply the same number of ascending parameters or a single ascending value.")
}

/** The reference's multi-key sort mini-language (mdataframe.py:319-403):
  * a mixed vararg list where strings are keys, bools are `ascending` for the
  * preceding key, ints are `axis`, string-lists are simultaneous multi-key
  * sorts, and ≤3-element mixed lists are `[by, axis, ascending]` triples.
  * Consecutive sorts apply one after another.
  *
  * Spark translation: consecutive `orderBy` calls discard prior order, and
  * pandas' default quicksort is unstable anyway, so the only guaranteed total
  * order is the LAST step's keys; we additionally append earlier steps' keys
  * as tiebreakers (a stable-sort-like guarantee the reference does not make,
  * but never contradicts). One global sort = one range-partition shuffle.
  */
object SortDsl {

  /** Parse the vararg mini-language into consecutive steps. `(name,
    * Column)` tuples register a computed key under `name` — the reference
    * accepts Python callables in the same position (mdataframe.py:339-348);
    * a named Catalyst expression is the Spark-native equivalent (it stays
    * in the plan, so the derived key is codegen'd, never materialized). */
  def parse(args: Seq[Any], defaultAxis: Int = 0): Seq[SortStep] = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[SortStep]
    var by: Option[Seq[String]] = None
    var ax = defaultAxis
    var ac: Seq[Boolean] = Seq(true)
    var comp: Map[String, Column] = Map.empty
    def flush(): Unit = by.foreach { b =>
      steps += SortStep(b, ax, ac, comp)
      by = None; ax = defaultAxis; ac = Seq(true); comp = Map.empty
    }
    args.foreach {
      case (s: String, c: Column) => flush(); by = Some(Seq(s)); comp = Map(s -> c)
      case s: String => flush(); by = Some(Seq(s))
      case b: Boolean => ac = Seq(b)
      case i: Int => ax = i
      case l: Seq[_] if l.nonEmpty && l.forall(_.isInstanceOf[String]) =>
        flush(); by = Some(l.map(_.asInstanceOf[String]))
      case l: Seq[_] if l.nonEmpty && l.forall(_.isInstanceOf[Boolean]) =>
        ac = l.map(_.asInstanceOf[Boolean])
        if (!by.exists(_.size == ac.size) && ac.size != 1)
          throw new IllegalArgumentException(
            "If you supply a list of columns/row to sort by, you must supply the same number of ascending parameters or a single ascending value.")
      case l: Seq[_] if l.size <= 3 => // [by, axis, ascending] triple, any order
        var tby: Option[String] = None; var tax = defaultAxis; var tac = true
        l.foreach {
          case s: String  => tby = Some(s)
          case b: Boolean => tac = b
          case i: Int     => require(i == 0 || i == 1); tax = i
          case o => throw new IllegalArgumentException(s"Don't know how to sort by this: $o.")
        }
        flush()
        steps += SortStep(Seq(tby.getOrElse(throw new IllegalArgumentException(
          "Triple sort needs a key"))), tax, Seq(tac))
      case o => throw new IllegalArgumentException(s"Don't know how to sort by this: $o.")
    }
    flush()
    steps.toSeq
  }

  /** Row sort (axis=0) of a plain DataFrame: later steps dominate, earlier
    * steps become tiebreakers. */
  def sortRows(df: DataFrame, steps: Seq[SortStep]): DataFrame = {
    val rowSteps = steps.filter(_.axis == 0)
    if (rowSteps.isEmpty) df
    else {
      val keys: Seq[Column] = rowSteps.reverse.flatMap { st =>
        st.by.zip(st.asc).map { case (c, a) =>
          val k = st.computed.getOrElse(c, col(c))
          if (a) k.asc else k.desc
        }
      }
      df.orderBy(keys: _*)
    }
  }

  /** Column-axis sort (axis=1, mdataframe.py:449-468 / O2): reorder value
    * COLUMNS by the values found in the row(s) labeled `by` — the samples
    * axis is small, so the permutation is computed from one collected row. */
  def sortColumns(df: DataFrame, index: String, step: SortStep): DataFrame = {
    val valueCols = df.columns.toSeq.filterNot(_ == index)
    val rows = step.by.map { rowLabel =>
      val r = df.filter(col(index) === rowLabel)
        .select(valueCols.map(c => col(c).cast("double")): _*).collect()
      require(r.nonEmpty, s"Unknown row : $rowLabel")
      valueCols.zipWithIndex.map { case (c, i) => c -> r(0).getDouble(i) }.toMap
    }
    val ascRow = step.asc
    val ordered = valueCols.sortWith { (a, b) =>
      // lexicographic by the sort rows, honoring per-key ascending
      rows.zip(ascRow).collectFirst {
        case (m, asc) if m(a) != m(b) => if (asc) m(a) < m(b) else m(a) > m(b)
      }.getOrElse(false)
    }
    df.select((col(index) +: ordered.map(col)): _*)
  }

  /** Full MFrame-aware sort: keys may live in metaRows (joined in for the
    * sort, then dropped — mdataframe.py:430-448) and axis=1 steps reorder
    * columns. Returns a new MFrame with meta row-alignment intact. */
  def sort(mf: MFrame, args: Any*): MFrame = {
    val steps = parse(args)
    var data = mf.data
    steps.foreach { st =>
      if (st.axis == 1) data = sortColumns(data, mf.index, st)
      else {
        val missing = st.by.filterNot(c =>
          data.columns.contains(c) || st.computed.contains(c))
        val fromMeta = mf.metaRows match {
          case Some(meta) =>
            val have = missing.filter(meta.columns.contains)
            val unknown = missing.filterNot(meta.columns.contains)
            if (unknown.nonEmpty)
              throw new IllegalArgumentException(s"Unknown column : ${unknown.head}.")
            have
          case None =>
            if (missing.nonEmpty)
              throw new IllegalArgumentException(s"Unknown column : ${missing.head}.")
            Nil
        }
        val joined =
          if (fromMeta.isEmpty) data
          else data.join(mf.metaRows.get.select((mf.index +: fromMeta).map(col): _*),
            Seq(mf.index), "left")
        data = sortRows(joined, Seq(st)).drop(fromMeta: _*)
      }
    }
    mf.copy(data = data)
  }

  /** Sort as a chainable Transformer on a plain DataFrame. */
  def transformer(args: Any*): Transformer =
    Transformer("sort", args)(df => sortRows(df, parse(args)))
}
