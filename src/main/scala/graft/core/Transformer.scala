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

  /** Parameters in declaration order; rendered to the fingerprint string. */
  protected def params: Seq[Any] = Seq.empty

  /** Stable textual form of the parameters (transformations.py:25-30). */
  final def parameterString: String = params.map(String.valueOf).mkString(",")

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
