package graft.core

import org.apache.spark.sql.DataFrame
import java.security.MessageDigest

/** Core operator abstraction, re-expressing the reference's `_Transformer`
  * protocol (reference: src/mdataframe/transformations.py:16-60): a named,
  * parameter-fingerprinted `DataFrame => DataFrame` function.
  *
  * Unlike the reference (eager pandas ops), a graft Transformer is
  * plan-to-plan: applying one only extends the Catalyst logical plan; nothing
  * executes until an action. Chains (`t1 andThen t2`) therefore compose into a
  * single optimized plan — Catalyst performs the predicate pushdown / column
  * pruning the reference does by hand.
  *
  * The fingerprint mirrors the reference's sha256 parameter hash
  * (transformations.py:25-42): it hashes ONLY the rendered parameter string,
  * not the name — two differently-named transformers with equal params have
  * equal fingerprints (reference tests/test_transformations.py:18-23).
  * Fingerprints key the optional checkpoint cache (the Spark analog of the
  * reference's pypipegraph invariant cache, mdataframe.py:208-230, 311-317).
  */
trait Transformer extends (DataFrame => DataFrame) with Serializable {

  /** Operator name (reference: `_Transformer.name`). */
  def name: String

  /** Parameters in declaration order; rendered to the fingerprint string.
    *
    * Defaults to EVERY constructor field (case-class product arity) so an
    * operator cannot accidentally omit an output-affecting parameter from
    * its fingerprint — two differently-configured instances colliding on
    * one CheckpointStore entry silently serves the wrong frame. Override
    * only to EXTEND (never to subset) what the default captures. */
  protected def params: Seq[Any] = this match {
    case p: Product => p.productIterator.toSeq
    case _          => Seq.empty
  }

  /** Stable textual form of the parameters (transformations.py:25-30). */
  final def parameterString: String = params.map(Transformer.render).mkString(",")

  /** sha256 hex of the parameter string (transformations.py:39-42). */
  final def fingerprint: String = Transformer.sha256(parameterString)

  /** Optional column suffix contract (transformations.py:52-57): when set,
    * every non-protected output column is renamed `col + suffix`. */
  def suffix: Option[String] = None

  def apply(df: DataFrame): DataFrame

  /** Chain two transformers into one (README.rst:22-26 chaining promise). */
  def andThen(next: Transformer): Transformer = {
    val self = this
    new Transformer {
      val name = s"${self.name}>${next.name}"
      override protected def params = Seq(self.fingerprint, next.fingerprint)
      def apply(df: DataFrame): DataFrame = next(self(df))
    }
  }

  /** Apply `suffix` to all columns except `protect` (typically the index
    * column, which the reference keeps in the pandas index and therefore
    * never suffixes). */
  protected final def applySuffix(df: DataFrame, protect: Seq[String]): DataFrame =
    suffix match {
      case Some(s) =>
        df.toDF(df.columns.toSeq.map(c => if (protect.contains(c)) c else c + s): _*)
      case None => df
    }
}

object Transformer {
  /** Deterministic rendering for fingerprinting: map entries are sorted by
    * key (a Scala Map's toString order depends on insertion order below
    * 5 entries, so equal maps could otherwise hash differently — the
    * reference requires equal params ⇒ equal fingerprints); DataFrames
    * render as schema PLUS the semantic hash of their analyzed plan, so
    * two operators wrapping different tables with identical schemas get
    * distinct fingerprints (same-plan frames still collide on purpose —
    * that is the cache hit). Content is not hashed: a table whose rows
    * changed under an unchanged plan (e.g. a re-written parquet path)
    * must be invalidated via the caller-supplied input key, documented on
    * [[graft.core.CheckpointStore]]. */
  def render(v: Any): String = v match {
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (String.valueOf(k), render(x)) }
        .sortBy(_._1).map { case (k, x) => s"$k -> $x" }
        .mkString("Map(", ", ", ")")
    case o: Option[_] => o.map(render).fold("None")(x => s"Some($x)")
    case df: org.apache.spark.sql.Dataset[_] =>
      s"DataFrame[${df.schema.catalogString}]@${df.queryExecution.analyzed.semanticHash()}"
    // concrete collection type is erased on purpose: List vs Vector of the
    // same values must fingerprint identically
    case s: scala.collection.Iterable[_] =>
      s.map(render).mkString("Seq(", ", ", ")")
    case other => String.valueOf(other)
  }

  def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Lift a plain function into a named Transformer. */
  def apply(opName: String, ps: Seq[Any])(f: DataFrame => DataFrame): Transformer =
    new Transformer {
      val name = opName
      override protected def params = ps
      def apply(df: DataFrame): DataFrame = f(df)
    }
}
