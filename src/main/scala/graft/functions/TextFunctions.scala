package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for large-scale training-data pipelines
  * (north-star extensions beyond the reference surface — SURVEY.md §7.2
  * step 7). All are pure Column expressions (whole-stage codegen, no UDFs)
  * so they fuse into the scan and scale linearly over a 100 TB documents
  * table.
  */
object TextFunctions {

  /** Lowercase, collapse non-alphanumerics to single spaces, trim — the
    * canonical form used by fingerprinting and dedup. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Evaluation barrier for an EXPENSIVE boolean gate (spark_guide §4.4
    * applied to expressions): wraps the predicate in a nondeterministic
    * identity UDF so the optimizer neither predicate-pushes it below the
    * spread exchange — where the single-file gate scan would evaluate
    * the whole substituted text kernel per row ON ONE TASK (stage probe:
    * 0.93 s of q_gopher_repetition's 1.7 s) — nor duplicates it into a
    * second evaluation. The value is still a pure function of its input;
    * the marker only pins WHERE it evaluates. Use on text-kernel gates
    * written after a spread/repartition; cheap scan-prunable predicates
    * (null checks, range cuts) must NOT go through this, or they lose
    * parquet pushdown. */
  def evalHere(pred: Column): Column = ndBoolIdentity(pred)
  private lazy val ndBoolIdentity =
    udf((b: java.lang.Boolean) => b).asNondeterministic()

  /** Unicode normalization (UAX #15) — `form` ∈ NFC|NFD|NFKC|NFKD. NFC is
    * the pre-hashing contract (CCNet): byte equality only means glyph
    * equality once composed/decomposed spellings of the same text agree.
    * A native codegen'd expression with an `isNormalized` fast path —
    * see [[graft.plans.UnicodeNormalizeExpr]]. NFKC additionally folds
    * compatibility forms (ﬁ→fi, fullwidth Ａ→A, ²→2) — the aggressive
    * variant search pipelines use. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.UnicodeNormalizeExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(c), form))

  /** Strip the invisible characters crawled text accumulates: CRLF/CR →
    * LF first, then remove C0 controls except \n and \t, DEL + C1
    * controls, the soft hyphen, zero-width space/non-joiner/joiner, and
    * the BOM/zero-width-no-break-space. The character class is written
    * with `\x{...}` escapes, valid in BOTH java.util.regex and RE2, so a
    * DuckDB oracle replays it verbatim. Pure builtin `regexp_replace`
    * chain — codegen'd, map-side. */
  def stripControlChars(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(c, "\r\n", "\n"), "\r", "\n"),
      "[\\x{00}-\\x{08}\\x{0B}-\\x{1F}\\x{7F}-\\x{9F}\\x{AD}\\x{200B}-\\x{200D}\\x{FEFF}]",
      "")

  /** Homoglyph (confusable) skeleton folding — the UTS #39 idea
    * restricted to a curated 1:1 mapping of the script lookalikes that
    * actually appear in spam/SEO text: Cyrillic and Greek letters that
    * render identically to Latin ones. Unicode NORMALIZATION cannot fold
    * these (NFKC keeps scripts apart by design), so two visually
    * identical spam pages hash apart and dodge exact dedup unless this
    * runs first. One codegen'd `translate` call, map-side; the oracle
    * replays it with DuckDB's own translate over the identical mapping.
    * Fold BEFORE fingerprint/shingle steps, after [[cleanUnicode]]. */
  val ConfusablePairs: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase lookalikes
    '\u0430' -> 'a', '\u0435' -> 'e', '\u043E' -> 'o', '\u0440' -> 'p',
    '\u0441' -> 'c', '\u0443' -> 'y', '\u0445' -> 'x', '\u0456' -> 'i',
    '\u0458' -> 'j', '\u0455' -> 's', '\u04BB' -> 'h', '\u0501' -> 'd',
    '\u051B' -> 'q', '\u051D' -> 'w', '\u0454' -> 'e', '\u0451' -> 'e',
    // Cyrillic uppercase lookalikes
    '\u0410' -> 'A', '\u0412' -> 'B', '\u0415' -> 'E', '\u041A' -> 'K',
    '\u041C' -> 'M', '\u041D' -> 'H', '\u041E' -> 'O', '\u0420' -> 'P',
    '\u0421' -> 'C', '\u0422' -> 'T', '\u0425' -> 'X', '\u0406' -> 'I',
    '\u0408' -> 'J', '\u0405' -> 'S',
    // Greek lookalikes (the unambiguous subset)
    '\u03BF' -> 'o', '\u03BD' -> 'v', '\u039F' -> 'O', '\u0391' -> 'A',
    '\u0392' -> 'B', '\u0395' -> 'E', '\u0396' -> 'Z', '\u0397' -> 'H',
    '\u0399' -> 'I', '\u039A' -> 'K', '\u039C' -> 'M', '\u039D' -> 'N',
    '\u03A1' -> 'P', '\u03A4' -> 'T', '\u03A5' -> 'Y', '\u03A7' -> 'X')

  def foldConfusables(c: Column): Column =
    translate(c, ConfusablePairs.map(_._1).mkString, ConfusablePairs.map(_._2).mkString)

  /** The standard ingestion text-hygiene pass: Unicode-normalize, then
    * strip invisibles (normalization never produces control characters,
    * so the order is safe). Run this BEFORE any fingerprint/shingle/
    * n-gram step so dedup keys agree across spellings of the same
    * glyphs. */
  def cleanUnicode(c: Column, form: String = "NFC"): Column =
    stripControlChars(unicodeNormalize(c, form))

  /** Sentence segmentation — the unit for Dolma-style sentence-level
    * dedup and per-sentence decontamination: a boundary is one or more
    * terminal marks ([.!?]) followed by horizontal whitespace; the
    * terminal marks STAY with their sentence, so reassembly is
    * byte-faithful. Deliberately regex-portable: implemented by marking
    * boundaries with a sentinel via backreference substitution (`$1` in
    * Java, `\\1` in RE2 — both engines support group refs even though
    * RE2 lacks the lookbehind a direct split would need) and splitting
    * on the sentinel. Heuristic by design: abbreviations ("Dr. Smith")
    * split — acceptable for dedup keys, where both sides of the
    * comparison segment identically. Empty segments drop; text with no
    * boundary is one sentence. */
  def sentenceSplit(c: Column): Column =
    filter(
      split(regexp_replace(c, "([.!?]+)[ \t]+", "$1\u0001"), "\u0001"),
      s => s =!= "")

  /** Whitespace tokens (empty strings dropped). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword token count: word pieces capped at 4 chars plus
    * punctuation marks each count as one token — a deterministic proxy for
    * byte-pair-encoded lengths (ceil(wordlen/4) per word + punct count). */
  def bpeTokenCount(c: Column): Column =
    aggregate(tokens(c), lit(0),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("int")) +
      punctCount(c)

  /** Count of punctuation marks (explicit class for cross-engine parity). */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,;:!?]", ""))

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "on", "for", "with",
    "that", "this", "it", "as", "are", "was", "be", "by", "at")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(lower(c))
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLength(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards moderate length, a healthy
    * stopword ratio and word lengths, penalizes punctuation soup. The
    * weights are a heuristic (length-normalized linear blend), chosen to be
    * exactly reproducible in ANSI SQL for the oracle. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val punctRatio = punctCount(c).cast("double") /
      greatest(length(c).cast("double"), lit(1.0))
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    val wordLen = meanTokenLength(c)
    val wordScore = when(wordLen >= 3.0 && wordLen <= 10.0, 1.0).otherwise(0.5)
    greatest(least(
      lenScore * 0.3 + stopScore * 0.3 + wordScore * 0.2 + (lit(1.0) - punctRatio * 5.0) * 0.2,
      lit(1.0)), lit(0.0))
  }

  /** Language-ID by stopword-profile hit counting: distinct-token overlap
    * with each language's marker list; argmax, ties broken by profile
    * order. A deterministic n-gram-free heuristic adequate for routing. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "como"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "it" -> Seq("il", "lo", "la", "gli", "che", "di", "un", "una", "per", "con"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val toks = array_distinct(tokens(lower(c)))
    LangProfiles.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*)))
    }
  }

  /** Best-scoring language, "und" (undetermined) when nothing matches. */
  def langId(c: Column): Column = {
    val scored = langScores(c)
    val best = scored.tail.foldLeft(
      struct(scored.head._2.as("s"), lit(scored.head._1).as("l"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("s"), struct(sc.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(best.getField("s") <= 0, "und").otherwise(best.getField("l"))
  }

  /** Content fingerprint: MD5 of the normalized text. MD5 is engine-
    * portable (identical hex in Spark and DuckDB), making exact-dedup
    * oracle-checkable. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Rolling (Rabin-Karp style) 64-bit hash of the normalized text —
    * cheap shift-resistant fingerprint; xxhash64 seeded variant. */
  def rollingFingerprint(c: Column, window: Int = 8): Column = {
    val n = normalizeText(c)
    // min over xxhash64 of all `window`-grams = a 1-hash MinHash — shift
    // robust and pure-expression
    val grams = charShingles(n, window)
    array_min(transform(grams, g => xxhash64(g)))
  }

  /** Engine-portable 64-bit gram hash: first 15 hex digits of the md5 →
    * long (60 bits, sign-safe). DuckDB computes the identical value as
    * `CAST('0x' || substring(md5(g), 1, 15) AS BIGINT)`, so fingerprint
    * schemes built on it stay oracle-checkable — unlike xxhash64, which
    * only Spark implements. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val winnowUdf = udf { (hashes: Seq[Long], w: Int) =>
    if (hashes == null || hashes.isEmpty) Array.empty[Long]
    else {
      val n = hashes.length
      val win = math.min(w, n)
      val out = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + win <= n) {
        var m = hashes(i); var j = i + 1
        while (j < i + win) { if (hashes(j) < m) m = hashes(j); j += 1 }
        out.add(m)
        i += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var x = 0
      while (it.hasNext) { arr(x) = it.next(); x += 1 }
      arr
    }
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS scheme): hash every k-gram of the normalized
    * text, slide a w-wide window over the hash sequence, keep each
    * window's minimum, distinct + sorted. Guarantees any shared
    * substring of length ≥ w + k − 1 contributes a shared fingerprint,
    * while storing ~2/(w+1) of the gram hashes. The gram hashing stays a
    * codegen'd expression evaluated once per gram ([[portableHash]]);
    * the sliding minima run in one compact UDF — expressing the windows
    * as slice()/array_min() expressions would re-evaluate the whole hash
    * array per window position (CollapseProject re-inlines deterministic
    * aliases; see PERF.md §4). */
  def winnowedFingerprints(c: Column, k: Int = 5, w: Int = 4): Column =
    winnowUdf(transform(charShingles(normalizeText(c), k), g => portableHash(g)), lit(w))

  /** All k-character shingles of a string as an array (expression-only:
    * transform over an index sequence + substr with Column offsets). */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) < k, array(c)).otherwise(
      transform(sequence(lit(1), length(c) - k + 1), i => c.substr(i, lit(k))))

  /** Word n-grams as strings ("w1 w2 ... wn"). */
  def wordNgrams(c: Column, n: Int): Column =
    wordNgramsFromTokens(tokens(normalizeText(c)), n)

  /** Word n-grams from an already-materialized token-array column. Pass a
    * plain column reference here when shingling a corpus: a computed
    * expression would re-evaluate once per n-gram position inside the
    * transform lambda. */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Repetition quality signals (the Gopher/Dolma rules adapted to
    * token streams): over the document's word n-gram OCCURRENCES,
    *  - `topNgramFraction`: share held by the single most frequent gram
    *    (boilerplate/chant detector);
    *  - `dupNgramFraction`: share that are repeats of an earlier
    *    occurrence, i.e. 1 − distinct/total (templated-text detector).
    * One compact UDF per doc over the gram array (a pure-expression mode
    * computation would need a per-element group-by; the counting loop is
    * O(grams) with one hash map). Empty docs score 0. */
  private val repStatsUdf = udf { (grams: Seq[String]) =>
    if (grams == null || grams.isEmpty) Array(0.0, 0.0)
    else {
      val counts = new java.util.HashMap[String, Int]()
      var max = 0
      grams.foreach { g =>
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > max) max = c
      }
      val total = grams.length.toDouble
      Array(max / total, 1.0 - counts.size / total)
    }
  }

  def topNgramFraction(c: Column, n: Int): Column =
    repStatsUdf(wordNgrams(c, n))(0)

  def dupNgramFraction(c: Column, n: Int): Column =
    repStatsUdf(wordNgrams(c, n))(1)

  /** Both repetition signals in ONE kernel pass (the UDF runs once; the
    * two element_at projections read the same evaluated array). */
  def repetitionStats(c: Column, n: Int): Column =
    repStatsUdf(wordNgrams(c, n))

  /** PII scrub (the C4/"responsible web-corpus" redaction step): emails
    * → `<EMAIL>`, dotted-quad IPs → `<IP>`, then any remaining run of 9+
    * digits (SSNs, phone numbers, card numbers written without
    * separators) → `<NUMBER>`, applied in that order so an address's
    * digits are consumed by its own tag first. Pure codegen'd
    * `regexp_replace` chain — no UDF in the hot path.
    *
    * The patterns are deliberately restricted to the syntax RE2 and
    * java.util.regex evaluate identically (character classes, counted
    * repetition, ASCII `\b`; no lookaround, no backreferences), so an
    * external engine reproduces the scrub byte-for-byte — that is what
    * lets the DuckDB oracle hash-match it. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
      "\\d{9,}", "<NUMBER>")

  /** Deflate compression ratio (compressed/raw bytes of the UTF-8
    * text) — the Gopher/Dolma-era cheap redundancy signal: templated or
    * repetitive spam compresses far below natural prose (~0.3 vs
    * ~0.6–0.8), and high-entropy noise sits near (or above) 1.0. Fixed
    * level and strategy make the value deterministic for a given JVM's
    * zlib; treat thresholds as corpus-calibrated knobs, not constants
    * (spec pins ORDERING, not absolute values). Null/empty → 1.0
    * (no signal, passes a min-ratio gate). One map-side UDF. */
  private val compressionRatioUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) 1.0
    else {
      val raw = text.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      var n = 0
      while (!d.finished()) n += d.deflate(buf, 0, buf.length)
      d.end()
      n.toDouble / raw.length
    }
  }

  def compressionRatio(c: Column): Column = compressionRatioUdf(c)

  /** Luhn checksum (ISO/IEC 7812 — the card-number check digit): the
    * validation that separates an actual primary account number from
    * any other 13–19 digit run, cutting the false positives of a bare
    * digit-count rule. Pure integer arithmetic, mirrored digit-for-
    * digit by the DuckDB oracle's list arithmetic. */
  def luhnValid(digits: String): Boolean = {
    val d = digits.filter(_.isDigit)
    if (d.length < 13 || d.length > 19) return false
    var sum = 0
    var i = 0
    while (i < d.length) {
      var x = d.charAt(d.length - 1 - i) - '0'
      if (i % 2 == 1) { x *= 2; if (x > 9) x -= 9 }
      sum += x
      i += 1
    }
    sum % 10 == 0
  }

  /** Candidate card-number runs: 13–19 digits with optional single
    * space/dash separators (the common formatted spellings). The
    * pattern stays in the RE2 ∩ java.util.regex dialect so the oracle
    * extracts the identical candidate set. */
  val CardCandidatePattern = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Redact Luhn-VALID card numbers to `<CARD>` (candidates that fail
    * the checksum stay — phone numbers and ids survive where the bare
    * 9-digit rule of [[redactPii]] would eat them). One map-side pass. */
  private val redactCardsUdf = udf { (text: String) =>
    if (text == null) null
    else CardCandidateRegex.replaceAllIn(text,
      m => if (luhnValid(m.matched)) "<CARD>"
           else java.util.regex.Matcher.quoteReplacement(m.matched))
  }
  private lazy val CardCandidateRegex =
    new scala.util.matching.Regex("\\b\\d(?:[ -]?\\d){12,18}\\b")

  def redactCards(c: Column): Column = redactCardsUdf(c)

  /** The Luhn check digit for a digit body (ISO/IEC 7812 Annex B):
    * the digit making body+check pass [[luhnValid]]. */
  def luhnCheckDigit(body: String): Int = {
    var sum = 0
    var i = 0
    val n = body.length
    while (i < n) {
      // right offset within body+check of body digit i (0-based left)
      // is n - i; doubled when odd
      var x = body.charAt(i) - '0'
      if ((n - i) % 2 == 1) { x *= 2; if (x > 9) x -= 9 }
      sum += x
      i += 1
    }
    (10 - sum % 10) % 10
  }

  /** The precision PII pass: Luhn-validated card redaction FIRST (so a
    * card's digits are consumed by its own tag), then the [[redactPii]]
    * email/IP/long-digit chain. */
  def redactPiiStrict(c: Column): Column = redactPii(redactCards(c))

  /** Line-level boilerplate strip (the CCNet/Dolma header-footer pass):
    * drop lines that read as navigation chrome rather than prose — a
    * line survives iff it has ≥ `minWords` whitespace words AND its
    * alphabetic-character ratio is ≥ `minAlphaRatio` (menus, copyright
    * footers and cookie banners are short and symbol/digit-heavy).
    * Surviving lines rejoin with their original newlines; a fully
    * boilerplate document becomes the empty string (callers filter).
    *
    * Pure codegen'd Column expression (split → filter → array_join —
    * no UDF), restricted to arithmetic both engines evaluate
    * identically, so the DuckDB oracle replays it exactly. */
  def stripBoilerplate(c: Column, minWords: Int = 4,
      minAlphaRatio: Double = 0.6): Column =
    array_join(
      filter(split(c, "\n"), l =>
        (size(filter(split(l, " "), w => w =!= "")) >= minWords) &&
          (length(regexp_replace(l, "[^a-zA-Z]", "")).cast("double") >=
            lit(minAlphaRatio) * length(l).cast("double"))),
      "\n")

  /** HTML → text extraction (the ingestion step BEFORE every text
    * gate when the source is raw crawl markup rather than pre-extracted
    * text): drop `<script>`/`<style>`/`<!-- -->` WITH their contents
    * (executable/styling payloads are not prose, and a tag-only strip
    * would leak them into the text), turn the remaining tags into
    * separators — block-level closers (`</p> </div> </li> </h1..6>
    * </tr> </table> </ul> </ol> </blockquote>`) and `<br>` become
    * newlines so line-based gates ([[stripBoilerplate]],
    * [[c4CleanLines]]) see real line structure, every other tag a
    * space — then decode the six ubiquitous named entities in a PINNED
    * order (`&lt; &gt; &quot; &#39; &nbsp;` first, `&amp;` LAST so
    * `&amp;lt;` decodes to the literal text `&lt;`, not `<` — the
    * single-pass decode order every correct extractor uses), and
    * collapse runs of spaces/tabs around the kept newlines.
    *
    * Deliberately a fixed `regexp_replace`/`replace` chain (codegen'd,
    * map-side, RE2-portable — `(?is)` inline flags and lazy `.*?` parse
    * identically in java.util.regex and RE2) so an external engine
    * replays the extraction byte-for-byte. This is the deterministic
    * 80% of readability extraction; DOM-aware main-content scoring
    * (trafilatura-style) is a different, non-replayable tier. */
  def htmlToText(c: Column): Column = {
    val noPayload = regexp_replace(regexp_replace(regexp_replace(c,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noPayload,
      "(?i)<(?:br\\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)\\s*>",
      "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
        "&#39;", "'"), "&nbsp;", " "), "&amp;", "&")
    regexp_replace(
      regexp_replace(regexp_replace(decoded,
        "[ \\t]*\\n[ \\t]*", "\n"), "[ \\t]+", " "),
      "^[ \\n]+|[ \\n]+$", "")
  }

  /** The cp1252-specific codepoints (left) and the 0x80–0x9F bytes they
    * occupy in that encoding (right) — mojibake produced by reading
    * UTF-8 bytes as windows-1252 shows THESE characters where Latin-1
    * would show C1 controls; translating them back to their byte values
    * reduces cp1252 mojibake to the Latin-1 case a charset round-trip
    * can repair. A fixed bijection (ftfy's "sloppy windows-1252"). */
  private val Cp1252Chars =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160\u2039" +
    "\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014\u02DC\u2122" +
    "\u0161\u203A\u0153\u017E\u0178"
  private val Cp1252Bytes =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A\u008B" +
    "\u008C\u008E\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099" +
    "\u009A\u009B\u009C\u009E\u009F"

  /** Mojibake repair (the ftfy core case): text whose UTF-8 bytes were
    * once decoded as Latin-1/windows-1252 shows `A-tilde + copyright`
    * for `e-acute` and `a-circ + euro + tm` for a right single quote.
    * The repair is the inverse round-trip — map the cp1252-specific
    * punctuation back to its byte values, re-encode the chars as
    * Latin-1 bytes, decode those bytes as UTF-8 — applied ONLY when it
    * is provably safe: the text carries the mojibake signature
    * (U+00C2/U+00C3/U+00E2 followed by a continuation-range char —
    * natural prose never does), every char fits a Latin-1 byte after
    * the cp1252 fold (so the re-encode is lossless; mixed CJK+mojibake
    * text is left untouched rather than destroyed), and the UTF-8
    * decode produced no replacement char (true Latin-1 prose like
    * `na\u00EFve` fails the signature and stays). Everything is
    * built-in `translate`/`encode`/`decode`/`rlike` — codegen'd,
    * map-side, and the decision is engine-replayable. Run BEFORE
    * [[cleanUnicode]]: repair bytes first, then normalize glyphs. */
  def fixMojibake(c: Column): Column = {
    val folded = translate(c, Cp1252Chars, Cp1252Bytes)
    val signature = folded.rlike("[\u00C2\u00C3\u00E2][\u0080-\u00BF]")
    val latin1Safe = folded.rlike("^[\u0000-\u00FF]*$")
    val repaired = decode(encode(folded, "ISO-8859-1"), "UTF-8")
    when(signature && latin1Safe && !repaired.rlike("\uFFFD"), repaired)
      .otherwise(c)
  }

  /** Token-blocklist gate (the C4 "bad words" page filter: a page is
    * dropped if it contains ANY blocklisted word): TRUE iff the
    * normalized token stream contains no listed word. Words are
    * matched on the canonical token stream (lowercased, punctuation
    * stripped — so "Agg!" hits a listed "agg"), and the list is
    * normalized the same way at plan build.
    *
    * The list rides as a literal array into a codegen'd
    * `arrays_overlap` — the right shape for word lists in the 10²–10⁴
    * range (C4's published list is ~400 entries); a list that rivals
    * the corpus vocabulary belongs in a broadcast join, not a scalar
    * predicate. Null text yields null (dropped by `where`, like every
    * other quality gate). */
  def noBlocklistedToken(c: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "empty blocklist — drop the gate instead")
    !arrays_overlap(tokens(normalizeText(c)),
      array(words.map(w => lit(w.trim.toLowerCase)): _*))
  }

  /** Aho–Corasick multi-pattern matcher over the normalized text — the
    * scale path for LARGE phrase blocklists ([[noBlocklistedToken]]'s
    * literal-array `isin` stops making sense past a few hundred single
    * tokens; production "bad words" lists run to 10⁵ multi-word
    * PHRASES). One automaton built driver-side (goto/fail/output,
    * Aho & Corasick 1975), shipped in the UDF closure like the quality
    * LM — matching is then O(text length) per document regardless of
    * list size, map-side, no join.
    *
    * Semantics: token-boundary phrase matches on [[normalizeText]]'s
    * canonical form — a phrase hits only when flanked by spaces or the
    * text edge, so "ass" never fires inside "class" and multi-word
    * phrases match across single spaces exactly. Returns the DISTINCT
    * matched phrases sorted (deterministic, oracle-replayable as a
    * per-phrase containment test over ' '||norm||' '). */
  def blocklistHits(c: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "empty blocklist — drop the gate instead")
    val ac = AhoCorasick.build(
      phrases.map(p => normalizePhrase(p)).filter(_.nonEmpty).distinct)
    val f = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else ac.matches(" " + t + " ").toArray.sorted
    }
    f(normalizeText(c))
  }

  /** True when no blocklisted phrase appears — the gate form. */
  def noBlocklistedPhrase(c: Column, phrases: Seq[String]): Column =
    size(blocklistHits(c, phrases)) === 0

  /** Hashing-trick term-frequency vector (Weinberger et al., ICML 2009 —
    * feature hashing): each token lands in bucket
    * portableHash(token) mod dim; the vector is the dense bucket-count
    * array. Text-only similarity WITHOUT an embedding model: feed the
    * result to [[graft.operators.Similarity]]'s cosine machinery
    * (bruteForceTopK, meanPoolBy, the IVF family). Pure expression (no
    * UDF), engine-portable hash, and the values are integer counts —
    * downstream cosines are exact integer arithmetic up to one sqrt and
    * one division, so they are BIT-IDENTICAL in any engine replaying
    * the same formula (no canonicalization, no tie jitter).
    * Cost is O(dim · tokens) per row: size dim to the similarity task
    * (64–1024), not to the vocabulary. */
  def hashingTfVector(c: Column, dim: Int): Column = {
    require(dim >= 1, "hashingTfVector: dim must be >= 1")
    val idx = transform(tokens(normalizeText(c)),
      t => pmod(portableHash(t), lit(dim)))
    // native one-pass bucket count (was transform(sequence)·filter —
    // O(dim·tokens) interpreted lambdas per row); counts are identical
    // integers cast to double, so every downstream exact-cosine oracle
    // is unaffected
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.BucketCountsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(idx), dim))
  }

  private def normalizePhrase(p: String): String =
    p.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /** Minimal Aho–Corasick automaton: flat arrays (dense-ish child maps),
    * boundary-aware emission — patterns are stored space-flanked so a
    * match is always token-aligned given space-flanked input. */
  final class AhoCorasick private (
      gotoMap: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int],
      out: Array[List[String]]) extends Serializable {
    /** All distinct pattern hits in `t` (t must be space-flanked). */
    def matches(t: String): Set[String] = {
      var s = 0
      val hits = scala.collection.mutable.Set.empty[String]
      var i = 0
      while (i < t.length) {
        val ch = t.charAt(i)
        var nxt = gotoMap(s).get(ch)
        while (nxt == null && s != 0) {
          s = fail(s); nxt = gotoMap(s).get(ch)
        }
        s = if (nxt == null) 0 else nxt.intValue()
        if (out(s).nonEmpty) hits ++= out(s)
        i += 1
      }
      hits.toSet
    }
  }

  object AhoCorasick {
    /** Build over normalized phrases; each pattern is matched
      * space-flanked (" phrase ") for token-boundary semantics. */
    def build(phrases: Seq[String]): AhoCorasick = {
      val gotoMap = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val outB = scala.collection.mutable.ArrayBuffer(List.empty[String])
      phrases.foreach { p =>
        val pat = " " + p + " "
        var s = 0
        var i = 0
        while (i < pat.length) {
          val ch = pat.charAt(i)
          val nxt = gotoMap(s).get(ch)
          if (nxt == null) {
            gotoMap += new java.util.HashMap[Character, Integer]()
            outB += Nil
            gotoMap(s).put(ch, gotoMap.length - 1)
            s = gotoMap.length - 1
          } else s = nxt.intValue()
          i += 1
        }
        outB(s) = p :: outB(s)
      }
      val n = gotoMap.length
      val fail = new Array[Int](n)
      val queue = new java.util.ArrayDeque[Integer]()
      gotoMap(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
      while (!queue.isEmpty) {
        val r = queue.poll().intValue()
        gotoMap(r).forEach { (ch, u) =>
          queue.add(u)
          var st = fail(r)
          while (st != 0 && gotoMap(st).get(ch) == null) st = fail(st)
          val f0 = gotoMap(st).get(ch)
          val f = if (f0 == null || f0.intValue() == u.intValue()) 0
            else f0.intValue()
          fail(u) = f
          outB(u) = outB(u) ++ outB(f)
        }
      }
      new AhoCorasick(gotoMap.toArray, fail, outB.toArray)
    }
  }

  /** The Gopher quality-rule stop words (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", appendix A1.1.1 MassiveWeb filters): a page must contain
    * at least two of these to pass the stop-word rule. */
  val GopherStopwords: Seq[String] = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** The raw per-document counts behind [[gopherRules]], as one struct
    * (single codegen'd pass — callers project fields for audit
    * dashboards without re-running the tokenizer):
    * n_words / word_chars (whitespace words, total characters),
    * n_hash / n_ellipsis (occurrences of `#` and `...`),
    * n_lines / n_bullet_lines / n_ellipsis_lines (newline-split lines;
    * a bullet line starts with `-`, `*` or `•` after left-trim; an
    * ellipsis line ends with `...` after right-trim),
    * n_alpha_words (words containing at least one ASCII letter),
    * n_stop_hits (how many DISTINCT words of `stopWords` appear in the
    * lowercased word stream).
    *
    * Every count is exact integer arithmetic (no division anywhere), so
    * an external engine reproduces the rule decisions bit-for-bit —
    * the oracle story. Null text yields a null struct. */
  def gopherStats(c: Column,
      stopWords: Seq[String] = GopherStopwords): Column = {
    val toks = tokens(c)
    val lowToks = tokens(lower(c))
    val lines = split(c, "\n")
    // struct() of null fields is a NON-null struct — guard explicitly
    // so null text gate-drops as one null value, not nine
    when(c.isNotNull, struct(
      size(toks).cast("long").as("n_words"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .as("word_chars"),
      (length(c) - length(regexp_replace(c, "#", ""))).cast("long")
        .as("n_hash"),
      ((length(c) - length(regexp_replace(c, "\\.\\.\\.", "")))
        .cast("long") / lit(3L)).cast("long").as("n_ellipsis"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("long")
        .as("n_bullet_lines"),
      size(filter(lines, l => endswith(rtrim(l), lit("...")))).cast("long")
        .as("n_ellipsis_lines"),
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
        .as("n_alpha_words"),
      size(filter(array(stopWords.map(lit): _*),
        w => array_contains(lowToks, w))).cast("long").as("n_stop_hits")))
  }

  /** The Gopher rule-set page filter (Rae et al. 2021 appendix
    * A1.1.1), faithful to the published thresholds (the defaults) but
    * parameterizable: TRUE iff
    *   - word count ∈ [minWords, maxWords]           (default 50–100,000)
    *   - mean word length ∈ [minMeanWordLen, maxMeanWordLen] (3–10 chars)
    *   - symbol-to-word ratio ≤ 0.1 for `#` AND for `...`
    *   - ≤ 90% of lines start with a bullet point
    *   - ≤ 30% of lines end with an ellipsis
    *   - ≥ 80% of words contain at least one alphabetic character
    *   - ≥ `minStopHits` distinct stop words appear   (default 2)
    *
    * All ratio rules are cross-multiplied into integer comparisons
    * (`n_hash·10 ≤ n_words`, `word_chars ≥ 3·n_words`, …) so the
    * decision involves NO floating point at all — exact at any scale
    * and byte-reproducible by any engine. Pure codegen'd predicate;
    * null text yields null (dropped by `where`, like every gate). */
  def gopherRules(c: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Int = 3, maxMeanWordLen: Int = 10,
      stopWords: Seq[String] = GopherStopwords,
      minStopHits: Int = 2): Column = {
    val st = gopherStats(c, stopWords)
    val w = st.getField("n_words")
    val chars = st.getField("word_chars")
    val nl = st.getField("n_lines")
    (w >= minWords) && (w <= maxWords) &&
      (chars >= lit(minMeanWordLen.toLong) * w) &&
      (chars <= lit(maxMeanWordLen.toLong) * w) &&
      (st.getField("n_hash") * 10 <= w) &&
      (st.getField("n_ellipsis") * 10 <= w) &&
      (st.getField("n_bullet_lines") * 10 <= nl * 9) &&
      (st.getField("n_ellipsis_lines") * 10 <= nl * 3) &&
      (st.getField("n_alpha_words") * 5 >= w * 4) &&
      (st.getField("n_stop_hits") >= minStopHits)
  }

  /** The exact integer counts behind [[gopherRepetitionRules]] (Rae et
    * al. 2021 appendix A1.1.2, the MassiveWeb repetition filters), one
    * kernel pass per document:
    *   - lines (split `\n`, trailing empties kept) and paragraphs
    *     (split `\n\n`): total / beyond-first-occurrence counts and the
    *     same pair over their character lengths;
    *   - word n-grams over the canonical normalized token stream:
    *     `topN_chars` (n = 2..4) = top-count × gram char length (among
    *     max-count grams the longest, a deterministic tie rule),
    *     `dupN_chars` (n = 5..10) = Σ count·len over grams occurring
    *     ≥ 2×, counting every occurrence (the overlap-naive published
    *     implementation convention); gram char length counts token
    *     characters only (no separators); `tok_chars` = Σ token chars.
    * All plain longs, so every ratio rule cross-multiplies to integer
    * comparisons an external engine replays exactly. Null text → null
    * struct. One O(Σ n·tokens) hash-count UDF per doc (the
    * [[repetitionStats]] precedent — a pure-expression form would need
    * a per-element group-by); the pass is map-side with zero shuffle. */
  def gopherRepetitionStats(c: Column): Column =
    gopherRepUdf(c, tokens(normalizeText(c)))

  // public: the UDF's result encoder generates accessor calls in
  // Janino-compiled code, which cannot see a private class's methods
  // (codegen would fall back to interpreter mode)
  case class GopherRepStats(
      n_lines: Long, n_dup_lines: Long, line_chars: Long, dup_line_chars: Long,
      n_paras: Long, n_dup_paras: Long, para_chars: Long, dup_para_chars: Long,
      top2_chars: Long, top3_chars: Long, top4_chars: Long,
      dup5_chars: Long, dup6_chars: Long, dup7_chars: Long,
      dup8_chars: Long, dup9_chars: Long, dup10_chars: Long,
      tok_chars: Long)

  private val gopherRepUdf = udf { (text: String, toks: Seq[String]) =>
    if (text == null) null
    else {
      def unitStats(units: Array[String]): (Long, Long, Long, Long) = {
        val counts = new java.util.HashMap[String, Int]()
        var dups = 0L; var chars = 0L; var dupChars = 0L
        units.foreach { u =>
          val c = counts.merge(u, 1, (a, b) => a + b)
          chars += u.length
          if (c > 1) { dups += 1; dupChars += u.length }
        }
        (units.length.toLong, dups, chars, dupChars)
      }
      val (nl, dl, lc, dlc) = unitStats(text.split("\n", -1))
      val (np, dp, pc, dpc) = unitStats(text.split("\n\n", -1))
      val ts = if (toks == null) Seq.empty[String] else toks
      val tokChars = ts.foldLeft(0L)(_ + _.length)
      // per n: gram -> (count, token-char length); grams keyed by the
      // space-joined form (tokens carry no spaces, so keys are unique)
      def gramStats(n: Int): (Long, Long) = {
        if (ts.length < n) return (0L, 0L)
        val counts = new java.util.HashMap[String, Array[Long]]()
        var i = 0
        while (i <= ts.length - n) {
          var len = 0L; var j = i
          while (j < i + n) { len += ts(j).length; j += 1 }
          val key = ts.slice(i, i + n).mkString(" ")
          val e = counts.computeIfAbsent(key, _ => Array(0L, len))
          e(0) += 1
          i += 1
        }
        var maxC = 0L; var maxLen = 0L; var dupCover = 0L
        counts.values.forEach { e =>
          if (e(0) > maxC) { maxC = e(0); maxLen = e(1) }
          else if (e(0) == maxC && e(1) > maxLen) maxLen = e(1)
          if (e(0) >= 2) dupCover += e(0) * e(1)
        }
        (maxC * maxLen, dupCover)
      }
      val top = (2 to 4).map(gramStats)
      val dup = (5 to 10).map(gramStats)
      GopherRepStats(nl, dl, lc, dlc, np, dp, pc, dpc,
        top(0)._1, top(1)._1, top(2)._1,
        dup(0)._2, dup(1)._2, dup(2)._2, dup(3)._2, dup(4)._2, dup(5)._2,
        tokChars)
    }
  }

  /** The Gopher repetition rule-set page filter (Rae et al. 2021
    * appendix A1.1.2), published thresholds as defaults: TRUE iff
    *   - duplicate line / paragraph fraction ≤ 0.30,
    *   - duplicate line / paragraph CHARACTER fraction ≤ 0.20,
    *   - top 2/3/4-gram character fraction ≤ 0.20 / 0.18 / 0.16,
    *   - duplicate 5..10-gram character fraction ≤
    *     0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10.
    * Thresholds are rational `num/100`, so every rule is the integer
    * comparison `stat·100 ≤ num·denominator` — float-free and
    * byte-replayable like [[gopherRules]] (its within-document
    * companion: that one gates on composition, this one on
    * repetition). An empty document passes trivially (0 ≤ 0). Null
    * text yields null (gate-dropped). */
  def gopherRepetitionRules(c: Column,
      maxDupLineFrac100: Int = 30, maxDupCharFrac100: Int = 20,
      maxTopGramFrac100: Seq[Int] = Seq(20, 18, 16),
      maxDupGramFrac100: Seq[Int] = Seq(15, 14, 13, 12, 11, 10)): Column = {
    require(maxTopGramFrac100.length == 3 && maxDupGramFrac100.length == 6,
      "thresholds are per n: top 2..4 (3 values), dup 5..10 (6 values)")
    val st = gopherRepetitionStats(c)
    def f(name: String) = st.getField(name)
    val tc = f("tok_chars")
    val lineRules =
      (f("n_dup_lines") * 100 <= f("n_lines") * maxDupLineFrac100) &&
        (f("dup_line_chars") * 100 <= f("line_chars") * maxDupCharFrac100) &&
        (f("n_dup_paras") * 100 <= f("n_paras") * maxDupLineFrac100) &&
        (f("dup_para_chars") * 100 <= f("para_chars") * maxDupCharFrac100)
    val topRules = Seq("top2_chars", "top3_chars", "top4_chars")
      .zip(maxTopGramFrac100)
      .map { case (n, t) => f(n) * 100 <= tc * t }
      .reduce(_ && _)
    val dupRules = Seq("dup5_chars", "dup6_chars", "dup7_chars",
      "dup8_chars", "dup9_chars", "dup10_chars")
      .zip(maxDupGramFrac100)
      .map { case (n, t) => f(n) * 100 <= tc * t }
      .reduce(_ && _)
    lineRules && topRules && dupRules
  }

  /** C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits
    * of Transfer Learning with a Unified Text-to-Text Transformer",
    * §2.2 heuristics — the line-scoped subset): a line survives iff
    *   - it ends in a terminal punctuation mark (`.` `!` `?` `"`)
    *     after right-trim,
    *   - it has at least `minLineWords` whitespace words (paper: 3),
    *   - it contains none of `dropMarkers` case-insensitively
    *     (paper: the word "javascript" — cookie/JS boilerplate).
    * Surviving lines rejoin with their original newlines; a fully
    * boilerplate page becomes the empty string (compose
    * [[c4PageRules]], which rejects it). Pure codegen'd split →
    * filter → array_join over exact string ops — the DuckDB oracle
    * replays it byte-for-byte. Null text stays null. */
  def c4CleanLines(c: Column, minLineWords: Int = 3,
      dropMarkers: Seq[String] = Seq("javascript")): Column =
    array_join(
      filter(split(c, "\n"), l =>
        dropMarkers.foldLeft(
          (endswith(rtrim(l), lit(".")) || endswith(rtrim(l), lit("!")) ||
            endswith(rtrim(l), lit("?")) || endswith(rtrim(l), lit("\""))) &&
            (size(filter(split(l, " "), w => w =!= "")) >= minLineWords)
        )((acc, m) => acc && !contains(lower(l), lit(m.toLowerCase)))),
      "\n")

  /** The C4 page-scoped rules (Raffel et al. 2020 §2.2) over an
    * already-line-cleaned page: TRUE iff
    *   - the page does NOT contain "lorem ipsum" (case-insensitive),
    *   - the page does NOT contain a curly bracket `{` (code, not prose),
    *   - the CLEANED page retains at least `minSentences` sentences
    *     (paper: 5), counted as occurrences of `.` `!` `?` in the
    *     cleaned text — every surviving line ends in one, so the count
    *     lower-bounds lines and adds intra-line sentence breaks.
    * `raw` is the original text (the lorem-ipsum/brace probes read the
    * page as crawled — a brace stripped by line cleaning still marks
    * the page as code-like); `cleaned` is [[c4CleanLines]]' output.
    * Integer comparisons only — byte-replayable. Null raw yields null
    * (gate-dropped). */
  def c4PageRules(raw: Column, cleaned: Column,
      minSentences: Int = 5): Column = {
    val sentences =
      (length(cleaned) - length(regexp_replace(cleaned, "[.!?]", "")))
        .cast("long")
    !contains(lower(raw), lit("lorem ipsum")) &&
      !contains(raw, lit("{")) &&
      (sentences >= minSentences)
  }

  /** Intra-document repeated-line scrub: keep the FIRST occurrence of
    * each exact line within a document, preserving order (the
    * within-page half of line dedup — crawlers duplicate nav blocks,
    * headers, and cookie banners inside one page; the cross-corpus
    * half is `Dedup.paragraphDedup`). Quadratic in the LINE count of
    * one document (each line scans its predecessors) — lines per page
    * are bounded small, and the expression stays codegen'd with zero
    * shuffle, which beats an explode + window at any corpus size.
    * Null text stays null; blank lines dedup like any other line. */
  def dedupLinesWithin(c: Column): Column = {
    val lines = split(c, "\n")
    array_join(
      filter(lines, (l, i) => not(array_contains(slice(lines, lit(1), i), l))),
      "\n")
  }

  /** Corpus-level n-gram frequency: occurrence counts of every word
    * n-gram across the corpus (docs shorter than n tokens contribute
    * nothing). The boilerplate census behind quality rules like "drop
    * lines occurring in > 0.1% of documents".
    *
    * Scale shape: explode → hash aggregate with map-side partial
    * combine (the heavy lifting happens before the shuffle: each task
    * emits its local gram counts, so shuffle volume is bounded by
    * DISTINCT grams per task, not occurrences); a top-k consumer should
    * `orderBy(count).limit(k)` on the result, which Spark executes as
    * TakeOrdered — a per-partition heap, never a global sort. */
  def corpusNgramCounts(df: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    val toks = tokens(normalizeText(col(textCol)))
    df.select(toks.as("__toks"))
      .where(evalHere(size(col("__toks")) >= n))
      .select(explode(wordNgramsFromTokens(col("__toks"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
  }

}
