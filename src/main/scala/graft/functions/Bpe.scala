package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real subword segmentation step a
  * training pipeline runs before packing/chunking (the whitespace and
  * regex counts in [[TextFunctions]] are cheap proxies; this is the
  * actual algorithm, Sennrich et al. 2016 / the GPT-2 recipe over
  * word-internal character pairs with an end-of-word marker).
  *
  * Scale shape (the [[graft.operators.QualityLm]] pattern): the FIT
  * aggregates word frequencies distributed (one groupBy over exploded
  * words — word-level counts, not documents, cross the wire), collects
  * the bounded top-`vocabCap` word table, and runs the merge loop on the
  * driver over that table — cost is flat in corpus size once the cap
  * binds, and every input to the loop is an exact integer count, so the
  * fit is DETERMINISTIC (ties in pair counts break lexicographically).
  * APPLY is map-side only: the merge ranks broadcast in the UDF closure,
  * each word segments independently with a per-partition memo cache
  * (Zipf makes the cache hit rate ~the token-frequency mass), and
  * nothing shuffles.
  */
object Bpe {

  /** End-of-word marker appended to each word's final character, so
    * "low" → l o w· and merges distinguish word-final from word-internal
    * contexts (the standard Sennrich formulation). */
  val Eow = "·"

  /** A fitted merge list in application order. `ranks` maps a token pair
    * to its merge priority (lower = earlier-learned = applied first). */
  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Segment one word (no whitespace) into subword tokens: start from
      * characters (+ end-of-word marker), repeatedly merge the
      * lowest-rank adjacent pair until none is mergeable. */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      val cs = word.toCharArray.map(_.toString).toVector
      encodeUnits(cs.updated(cs.length - 1, cs.last + Eow))
    }

    /** The merge loop over an arbitrary start alphabet (character+Eow
      * units for word-level, byte-mapped units for byte-level). */
    def encodeUnits(units: Vector[String]): Seq[String] = {
      var toks = units
      var done = toks.length < 2
      while (!done) {
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < toks.length - 1) {
          val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else {
          toks = (toks.take(at) :+ (toks(at) + toks(at + 1))) ++ toks.drop(at + 2)
          if (toks.length < 2) done = true
        }
      }
      toks
    }
  }

  /** Fit `numMerges` merges on the corpus' word-frequency table.
    * `vocabCap` bounds the driver-side table to the top words by
    * (count DESC, word ASC) — a deterministic total order, and the knob
    * that keeps fit cost flat in corpus size (tail words contribute
    * negligible pair mass; production BPE fits on samples for the same
    * reason). */
  def fit(ref: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 20000): Model = {
    require(numMerges > 0, "numMerges must be positive")
    require(vocabCap > 0, "vocabCap must be positive")
    val words = ref
      .select(explode(TextFunctions.tokens(
        TextFunctions.normalizeText(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver merge loop over the bounded word table: words as token
    // vectors, pair counts weighted by word frequency
    val table: Array[(Vector[String], Long)] = words.map { case (w, n) =>
      val cs = w.toCharArray.map(_.toString).toVector
      (cs.updated(cs.length - 1, cs.last + Eow), n)
    }
    Model(mergeLoop(table, numMerges))
  }

  /** The deterministic driver-side merge loop shared by the word-level
    * and byte-level fits: repeatedly merge the (count DESC, pair
    * lexicographic) argmax pair across the frequency-weighted table. */
  private def mergeLoop(start: Array[(Vector[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    var table = start
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      table.foreach { case (toks, n) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count DESC, then pair lexicographic
        val best = counts.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val (ba, bb) = best
        table = table.map { case (toks, n) =>
          if (toks.length < 2) (toks, n)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && toks(i) == ba && toks(i + 1) == bb) {
                out += (ba + bb); i += 2
              } else { out += toks(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Subword tokens of a text column under `model` — normalized
    * whitespace words, each segmented independently. Map-side UDF with a
    * per-partition word→tokens memo (Zipf: the cache absorbs most of the
    * work). */
  /** Per-task memo cap: past this many distinct words the memo stops
    * inserting (correctness unaffected — encodeWord always answers; only
    * the cache-hit rate degrades). Bounds executor memory on adversarial
    * high-cardinality corpora (random tokens break the Zipf assumption
    * an unbounded cache relies on). */
  val MemoCap: Int = 1 << 20

  def tokenize(c: Column, model: Model): Column = {
    val f = udf(new (Seq[String] => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Seq[String]](1 << 16)
      def apply(words: Seq[String]): Seq[String] =
        if (words == null) Seq.empty
        else words.flatMap { w =>
          var t = memo.get(w)
          if (t == null) {
            t = model.encodeWord(w)
            if (memo.size < MemoCap) memo.put(w, t)
          }
          t
        }
    })
    f(TextFunctions.tokens(TextFunctions.normalizeText(c)))
  }

  /** BPE token count under `model`. */
  def tokenCount(c: Column, model: Model): Column =
    size(tokenize(c, model))

  // --------------------------------------------------------------------
  // Byte-level BPE (the GPT-2 recipe, Radford et al. 2019): pretokenize
  // with the GPT-2 regex (contractions, optional-space word/number/punct
  // runs, whitespace runs), map each pretoken's UTF-8 bytes to the
  // printable byte-alphabet, and merge over THOSE units with no
  // end-of-word marker. tokenCountBytes denominates packing in what a
  // production trainer actually counts.
  // --------------------------------------------------------------------

  /** The GPT-2 pretokenization arms WITHOUT the `\s+(?!\S)` lookahead
    * (RE2 — the oracle engine's regex — has no lookahead), applied as
    * regex-then-fixup: whole whitespace runs match the final `\s+` arm,
    * then [[pretokenize]] re-donates each run's last character to the
    * following token exactly as the lookahead would have (a trailing
    * space attaches as the next arm's optional leading space; any other
    * trailing whitespace char becomes its own token). The ONE divergence
    * from byte-for-byte GPT-2: a contraction immediately after a
    * multi-space run keeps its donated space (" 's") instead of
    * splitting as " '" + "s" — documented, deterministic, and identical
    * in the Spark UDF and the generated DuckDB SQL, which is the
    * property the oracle gates need. */
  val PretokenRegex: String =
    // \s is spelled out as [ \t\n\f\r]: Java's \s includes U+000B
    // (vertical tab) but DuckDB's RE2 \s does not, so a doc containing
    // a vertical tab would pretokenize differently in the Spark UDF vs
    // the oracle replay. With the explicit class, U+000B lands in the
    // punct arm in BOTH engines (not \p{L}/\p{N}, not in the class).
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  private lazy val PretokenPattern =
    java.util.regex.Pattern.compile(PretokenRegex)

  // U+000B deliberately absent: it is NOT whitespace to the
  // pretokenizer (see [[PretokenRegex]]) -- both engines route it
  // to the punct arm.
  private def isWs(s: String): Boolean = s.forall(ch =>
    ch == ' ' || ch == '\t' || ch == '\n' ||
      ch == '\f' || ch == '\r')

  /** GPT-2-style pretokens of one text (regex + whitespace-donation
    * fixup — see [[PretokenRegex]]). */
  def pretokenize(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val m = PretokenPattern.matcher(text)
    val raw = Vector.newBuilder[String]
    while (m.find()) raw += m.group()
    val toks = raw.result()
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (isWs(t) && i < toks.length - 1) {
        val head = t.substring(0, t.length - 1)
        if (head.nonEmpty) out += head
        val last = t.charAt(t.length - 1)
        if (last == ' ') {
          out += (" " + toks(i + 1)); i += 2
        } else {
          out += last.toString; i += 1
        }
      } else { out += t; i += 1 }
    }
    out.result()
  }

  /** The GPT-2 byte→printable-unicode bijection: visible latin-1 bytes
    * (33–126, 161–172, 174–255) map to themselves, the rest to
    * U+0100 + n in byte order (so 0x20 → 'Ġ' U+0120, 0x0A → 'Ċ'
    * U+010A). Keeps merge units printable and 1 char = 1 byte. */
  lazy val ByteToChar: Array[Char] = {
    val visible = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (visible(b)) b.toChar
      else { val c = (256 + n).toChar; n += 1; c }
    }.toArray
  }

  lazy val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** One pretoken as byte-mapped single-char units. */
  def byteUnits(pretoken: String): Vector[String] =
    pretoken.getBytes("UTF-8").map(b => ByteToChar(b & 0xFF).toString).toVector

  /** A merge unit serialized as uppercase hex of its underlying bytes —
    * the engine-portable form the oracle replays against DuckDB's
    * `hex(encode(w))` (concatenation of units = concatenation of hex,
    * so the merge algebra is preserved verbatim). */
  def unitHex(unit: String): String =
    unit.map(ch => f"${CharToByte(ch)}%02X").mkString

  /** Fit `numMerges` byte-level merges on the corpus' pretoken-frequency
    * table — same bounded driver loop as [[fit]], same deterministic tie
    * rules, no end-of-word marker (byte-level carries the boundary in
    * the leading-space byte instead). */
  def fitBytes(ref: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 20000): Model = {
    require(numMerges > 0, "numMerges must be positive")
    require(vocabCap > 0, "vocabCap must be positive")
    val pretokUdf = udf((t: String) => pretokenize(t))
    val words = ref
      .select(explode(pretokUdf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val table: Array[(Vector[String], Long)] =
      words.map { case (w, n) => (byteUnits(w), n) }
    Model(mergeLoop(table, numMerges))
  }

  /** Byte-level subword tokens of a text column: pretokenize, byte-map,
    * merge — map-side UDF with the same per-partition memo as
    * [[tokenize]], keyed by pretoken. */
  def tokenizeBytes(c: Column, model: Model): Column = {
    val f = udf(new (String => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Seq[String]](1 << 16)
      def apply(text: String): Seq[String] =
        if (text == null) Seq.empty
        else pretokenize(text).flatMap { w =>
          var t = memo.get(w)
          if (t == null) {
            t = model.encodeUnits(byteUnits(w))
            if (memo.size < MemoCap) memo.put(w, t)
          }
          t
        }
    })
    f(c)
  }

  /** Byte-level BPE token count under `model`. */
  def tokenCountBytes(c: Column, model: Model): Column =
    size(tokenizeBytes(c, model))

  /** Inverse of [[tokenizeBytes]]: map each token's chars back to bytes
    * and decode UTF-8. LOSSLESS by construction — the pretokenizer arms
    * cover every character class (letters / digits / punct / whitespace),
    * so the pretokens concatenate back to the original text, the
    * byte→char map is a bijection, and merges only concatenate units.
    * BpeSpec pins detokenizeBytes ∘ tokenizeBytes == identity over the
    * corpus. */
  def detokenizeBytes(tokens: Seq[String]): String = {
    if (tokens == null || tokens.isEmpty) return ""
    val bytes = tokens.iterator.flatMap(_.iterator.map(ch => CharToByte(ch).toByte)).toArray
    new String(bytes, "UTF-8")
  }

  /** Column form of [[detokenizeBytes]]. */
  def detokenizeBytesCol(c: Column): Column = {
    val f = udf((toks: Seq[String]) => detokenizeBytes(toks))
    f(c)
  }
}
