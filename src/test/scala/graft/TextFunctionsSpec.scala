package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    (1L, "The quick brown fox, and the lazy dog!"),
    (2L, "der die das und ist nicht ein mit"),
    (3L, "el la los es un una que por"),
    (4L, ""),
    (5L, "xyzzy plugh")
  ).toDF("id", "text")

  private def one[T](c: org.apache.spark.sql.Column, id: Long): T =
    df.filter($"id" === id).select(c.as("v")).collect()(0).getAs[T]("v")

  test("unicodeNormalize: NFC composes, NFKC folds compatibility forms, null passes") {
    // every non-ASCII char spelled as a \u escape: the composed-vs-
    // decomposed distinction IS the fixture, and must survive editors
    val in0 = Seq(
      (1L, "cafe\u0301"),     // decomposed -> composed
      (2L, "caf\u00E9"),      // already NFC: fast path
      // fi-ligature, fullwidth Abc, superscript 2, circled 1
      (3L, "\uFB01le \uFF21\uFF42\uFF43\u00B2 \u2460"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val nfc = in0.select($"id", unicodeNormalize($"t").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == "caf\u00E9")
    assert(nfc(2L) == "caf\u00E9")
    assert(nfc(3L) == "\uFB01le \uFF21\uFF42\uFF43\u00B2 \u2460",
      "NFC must NOT touch compatibility forms")
    assert(nfc(4L) == null)
    val nfkc = in0.select($"id", unicodeNormalize($"t", "NFKC").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfkc(3L) == "file Abc2 1", s"got '${nfkc(3L)}'")
    assert(nfkc(1L) == "caf\u00E9") // decomposed + NFKC still composes
    // invalid form fails loud at analysis
    val e = intercept[Exception] {
      in0.select(unicodeNormalize($"t", "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC"), s"got ${e.getMessage}")
  }

  test("stripControlChars: CRLF->LF, controls/zero-widths dropped, tab+LF kept") {
    // ZWSP, soft hyphen, BOM, BEL -- all as escapes, never raw bytes
    val in0 = Seq((1L,
      "ab\r\nc\rd\te\nf\u200Bg\u00ADh\uFEFF\u0007ij")).toDF("id", "t")
    val out = in0.select(stripControlChars($"t")).collect()(0).getString(0)
    assert(out == "ab\nc\nd\te\nfghij", s"got ${out.map(_.toInt).mkString(",")}")
    // idempotent on its own output
    val twice = in0.select(stripControlChars(stripControlChars($"t")))
      .collect()(0).getString(0)
    assert(twice == out)
  }

  test("cleanUnicode: dedup keys agree across spellings of the same glyphs") {
    val in0 = Seq(
      (1L, "Caf\u00E9 du Nord"),
      (2L, "Cafe\u0301\u200B du Nord")).toDF("id", "t")
    val keys = in0.select($"id", fingerprint(cleanUnicode($"t")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) == keys(2L),
      "composed and decomposed+ZWSP spellings must fingerprint identically")
  }

  test("redactPii: emails, dotted quads, long digit runs — in that order") {
    val cases = Seq(
      ("mail me: first.last+tag@sub.example.co today", "mail me: <EMAIL> today"),
      ("server at 192.168.254.1 responded", "server at <IP> responded"),
      ("card 4111111111111111 and ssn 123456789.", "card <NUMBER> and ssn <NUMBER>."),
      // the email's own digits are consumed by <EMAIL>, not <NUMBER>;
      // an 8-digit run is below the 9-digit floor and survives
      ("u123456789@x.org plus 12345678 stays", "<EMAIL> plus 12345678 stays"),
      // version strings are NOT dotted quads once a segment exceeds 3
      // digits or a boundary is missing
      ("v1.2.3 and 1.2.3.4567 pass through", "v1.2.3 and 1.2.3.4567 pass through"),
      ("no pii here", "no pii here"))
    val out = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("id", "t")
      .select($"id", redactPii($"t").as("r")).orderBy("id")
      .collect().map(_.getString(1))
    cases.zip(out).foreach { case ((in, expect), got) =>
      assert(got == expect, s"input '$in'")
    }
  }

  test("normalize + tokens + counts") {
    assert(one[String](normalizeText(col("text")), 1L) ==
      "the quick brown fox and the lazy dog")
    assert(one[Int](tokenCount(col("text")), 1L) == 8)
    assert(one[Int](tokenCount(col("text")), 4L) == 0)
    assert(one[Int](punctCount(col("text")), 1L) == 2)
  }

  test("stopword ratio and mean token length") {
    assert(math.abs(one[Double](stopwordRatio(col("text")), 1L) - 3.0 / 8) < 1e-12)
    assert(one[Double](meanTokenLength(col("text")), 4L) == 0.0)
  }

  test("bpe-ish token count: ceil(len/4) per word + punctuation") {
    // "ab cdefgh." -> ceil(2/4)+ceil(8/4) + 1 punct = 1+2+1 (the '.' is
    // part of token "cdefgh." len 7 -> ceil(7/4)=2)
    val d2 = Seq("ab cdefgh.").toDF("text")
    val got = d2.select(bpeTokenCount(col("text")).as("v")).collect()(0).getAs[Int]("v")
    assert(got == 4, s"got $got")
  }

  test("language id picks the profile with most marker hits; und for none") {
    assert(one[String](langId(col("text")), 1L) == "en")
    assert(one[String](langId(col("text")), 2L) == "de")
    assert(one[String](langId(col("text")), 3L) == "es")
    assert(one[String](langId(col("text")), 5L) == "und")
  }

  test("quality score in [0,1], higher for natural text than noise") {
    val q1 = one[Double](qualityScore(col("text")), 1L)
    val q5 = one[Double](qualityScore(col("text")), 5L)
    assert(q1 >= 0 && q1 <= 1 && q5 >= 0 && q5 <= 1)
    assert(q1 > q5)
  }

  test("fingerprints: md5 of normalized text; rolling fingerprint shift-stable") {
    val a = Seq("Hello, World!").toDF("text")
    val b = Seq("hello world").toDF("text")
    def fp(d: org.apache.spark.sql.DataFrame) =
      d.select(fingerprint(col("text")).as("v")).collect()(0).getString(0)
    assert(fp(a) == fp(b))
    // rolling fingerprint survives a prefix insertion when the window
    // content still appears
    val c = Seq("PREFIX hello world this is some shared content tail").toDF("text")
    val e = Seq("hello world this is some shared content tail").toDF("text")
    def rfp(d: org.apache.spark.sql.DataFrame) =
      d.select(rollingFingerprint(col("text")).as("v")).collect()(0).getLong(0)
    assert(rfp(c) == rfp(e))
  }

  test("winnowing: shared substrings ≥ w+k−1 share fingerprints; sorted distinct; short-doc edge") {
    val shared = "the quick brown fox jumps over the lazy dog near the river"
    val df = Seq(
      (1L, s"AAAA unique prefix one $shared unique suffix alpha"),
      (2L, s"completely different opening text $shared and another ending"),
      (3L, "nothing in common with the others at all zebra quartz")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), winnowedFingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // guarantee: docs 1 and 2 share a ≥ (4+5−1)-char substring → overlap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    // doc 3 shares (almost) nothing: far smaller overlap than 1∩2
    assert(fps(1L).toSet.intersect(fps(2L).toSet).size >
      fps(1L).toSet.intersect(fps(3L).toSet).size)
    // sorted + distinct contract
    fps.values.foreach { v =>
      assert(v == v.sorted && v.toSet.size == v.size)
    }
    // compression: far fewer fingerprints than grams
    val doc1len = "aaaa unique prefix one the quick brown fox jumps over the lazy dog near the river unique suffix alpha".length
    assert(fps(1L).size < doc1len - 4)
    // short doc (< k chars → one gram → one fingerprint); empty stays empty
    val short = Seq((9L, "ab"), (10L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), winnowedFingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(short(9L).size == 1 && short(10L).size == 1)
  }

  test("char shingles and word ngrams") {
    val d = Seq("abcdef").toDF("text")
    val sh = d.select(charShingles(col("text"), 4).as("v")).collect()(0)
      .getSeq[String](0)
    assert(sh == Seq("abcd", "bcde", "cdef"))
    val ng = Seq("a b c d").toDF("text")
      .select(wordNgrams(col("text"), 2).as("v")).collect()(0).getSeq[String](0)
    assert(ng == Seq("a b", "b c", "c d"))
  }

  test("repetition signals: top-gram and duplicate-gram fractions") {
    // "a b a b a b": 2-gram occurrences [ab, ba, ab, ba, ab] → top 3/5;
    // 3-grams [aba, bab, aba, bab] → 2 distinct of 4 → dup 0.5
    val d = Seq("a b a b a b").toDF("text")
    val r = d.select(
      topNgramFraction(col("text"), 2).as("t2"),
      dupNgramFraction(col("text"), 3).as("d3"),
      repetitionStats(col("text"), 2).as("both")).collect()(0)
    assert(math.abs(r.getDouble(0) - 0.6) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
    assert(math.abs(r.getSeq[Double](2)(0) - 0.6) < 1e-12)
    // unique text: no repetition
    val u = Seq("one two three four").toDF("text")
      .select(dupNgramFraction(col("text"), 2).as("d")).collect()(0).getDouble(0)
    assert(u == 0.0)
    // empty text degenerates to the single empty gram (top=1, dup=0)
    val e = Seq("").toDF("text")
      .select(repetitionStats(col("text"), 2).as("r")).collect()(0).getSeq[Double](0)
    assert(e == Seq(1.0, 0.0))
  }

  test("gopherStats: exact integer counts per rule input") {
    val text = "the cat sat on a mat with a dog and a hat ok\n" +
      "- bullet line one\n" +
      "* bullet line two\n" +
      "trailing ellipsis line...\n" +
      "## markdown #tags and more... text 42 99"
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val st = d.select(gopherStats(col("text"), Seq("the", "a")).as("s"))
      .select("s.*").collect()(0)
    // words split on ' ' ONLY (the oracle-parity tokenizer), so
    // newline-adjacent pieces fuse: "ok\n-", "one\n*", "two\ntrailing",
    // "line...\n##" are single words → 28, not the \s+ count
    assert(st.getAs[Long]("n_words") == 28)
    assert(st.getAs[Long]("n_hash") == 3)      // "##" + "#tags"
    assert(st.getAs[Long]("n_ellipsis") == 2)  // "line..." + "more..."
    assert(st.getAs[Long]("n_lines") == 5)
    assert(st.getAs[Long]("n_bullet_lines") == 2)
    assert(st.getAs[Long]("n_ellipsis_lines") == 1)
    // only "42" and "99" carry no letter
    assert(st.getAs[Long]("n_alpha_words") == 26)
    assert(st.getAs[Long]("n_stop_hits") == 2) // DISTINCT: the + a, not 5
    // null text → null struct (gate-drops like every quality rule)
    val n = Seq((2L, Option.empty[String])).toDF("doc_id", "text")
      .select(gopherStats(col("text")).as("s")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("gopherRules: each published rule fires independently") {
    val stop = Seq("the", "a")
    def passes(t: String): Boolean =
      Seq((1L, t)).toDF("doc_id", "text")
        .where(gopherRules(col("text"), minWords = 5, stopWords = stop))
        .count() == 1
    // 13 words, 45 word-chars (mean 3.46 ∈ [3,10]), both stops, all
    // alphabetic, no symbols/bullets/ellipses — every rule green
    val good = "the cat sat upon a mat and the dog sprinted far away home"
    assert(passes(good))
    assert(!passes("the a cat"), "word-count floor")
    assert(!passes("a b c d e f g h i j k l m the on"), "mean word length < 3")
    assert(!passes(good + " " + "antidisestablishmentarianism " * 30),
      "mean word length > 10")
    assert(!passes("the # cat # sat # upon # a # mat # and # dog #"),
      "symbol-to-word ratio for #")
    assert(!passes("- the cat\n- a dog sat\n- on a mat\n- and ran\n- far away"),
      "over 90% bullet lines")
    // two 15-word lines both ending "..." — the '...' SYMBOL ratio
    // passes (2 per 29 words) so only the line-share rule fires
    assert(!passes(Seq.fill(2)(good + " again today...").mkString("\n")),
      "over 30% ellipsis lines")
    assert(!passes("the 111 222 333 444 555 666 777 888 a 999 1010 1111 1212 1313"),
      "under 80% alphabetic words")
    assert(!passes("the cat sat upon top rugs its mat and then ran off"),
      "needs 2 distinct stop hits ('a' absent)")
    // ratio rules are integer cross-multiplications (no float anywhere):
    // 1 bullet line of 10 passes the 90% share, numerals stay under the
    // 20% non-alphabetic budget
    val tenLines = (1 to 10)
      .map(i => (if (i == 1) "- " else "") + s"line $i with a file about the cats")
      .mkString("\n")
    assert(passes(tenLines))
  }

  test("noBlocklistedToken: canonical-token matching, null text drops, list normalized") {
    val docs = Seq(
      (1L, Some("a clean sentence here")),
      (2L, Some("contains the Bad! word")),   // punctuation/case-insensitive hit
      (3L, Some("badge is not bad-ge")),      // substring must NOT match ("badge" != "bad"; "bad-ge" splits to bad + ge -> hit)
      (4L, Option.empty[String])
    ).toDF("doc_id", "text")
    val kept = docs.where(noBlocklistedToken(col("text"), Seq(" BAD ")))
      .collect().map(_.getLong(0)).toSet
    // doc 3 is dropped: "bad-ge" normalizes to tokens (bad, ge); doc 4's
    // null gate-drops like every quality gate
    assert(kept == Set(1L))
    val kept2 = docs.where(noBlocklistedToken(col("text"), Seq("ge")))
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L), "whole-token matching: 'badge' must not match 'ge'")
    intercept[IllegalArgumentException] {
      docs.where(noBlocklistedToken(col("text"), Seq.empty)).count()
    }
  }

  test("blocklistHits (Aho–Corasick): boundaries, overlaps, phrases, naive parity") {
    // driver-side automaton laws first
    val ac = AhoCorasick.build(Seq("bad word", "bad", "word up", "up"))
    assert(ac.matches(" this bad word up here ") ==
      Set("bad word", "bad", "word up", "up"),
      "overlapping phrase hits must all surface (shared spaces reused)")
    assert(ac.matches(" badge wordy ") == Set.empty,
      "token boundaries: no substring hits")
    assert(ac.matches(" bad ") == Set("bad"))
    // column form: normalization + distinct + sorted
    val docs = Seq(
      (1L, Some("a clean sentence here")),
      (2L, Some("the Bad! Word and more")),   // case/punct-insensitive phrase hit
      (3L, Some("badge wordless")),            // substrings never match
      (4L, Option.empty[String])
    ).toDF("doc_id", "text")
    val hits = docs.select(col("doc_id"),
      blocklistHits(col("text"), Seq("bad word", "clean")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(hits(1L) == Seq("clean"))
    assert(hits(2L) == Seq("bad word"))
    assert(hits(3L) == Seq.empty && hits(4L) == Seq.empty)
    assert(docs.where(noBlocklistedPhrase(col("text"), Seq("bad word")))
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    // parity with the naive containment oracle on a 2k-phrase list over
    // the corpus — the exact check q_blocklist_10k replays in SQL
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("text").isNotNull)
    val phrases = corpusNgramCounts(corpus, "text", 2)
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(2000).collect().map(_.getString(0)).toSeq
    val viaAc = corpus.select(col("doc_id"),
      explode(blocklistHits(col("text"), phrases)).as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = corpus
      .select(col("doc_id"),
        concat(lit(" "), normalizeText(col("text")), lit(" ")).as("nt"))
      .collect().flatMap { r =>
        phrases.collect {
          case p if r.getString(1).contains(" " + p + " ") => (r.getLong(0), p)
        }
      }.toSet
    assert(viaAc == naive,
      s"AC vs naive: ${(viaAc diff naive).take(3)} / ${(naive diff viaAc).take(3)}")
  }

  test("gopherRepetitionStats: exact counts for lines, paragraphs, and gram coverage") {
    // toks = [x,y,x,y,x,y,x,y,z,w] after normalization
    val text = "x y x y\nx y x y\nz w"
    val st = Seq((1L, text)).toDF("doc_id", "text")
      .select(gopherRepetitionStats(col("text")).as("s"))
      .select("s.*").collect()(0)
    assert(st.getAs[Long]("n_lines") == 3)
    assert(st.getAs[Long]("n_dup_lines") == 1)
    assert(st.getAs[Long]("line_chars") == 17)
    assert(st.getAs[Long]("dup_line_chars") == 7)
    assert(st.getAs[Long]("n_paras") == 1)
    assert(st.getAs[Long]("n_dup_paras") == 0)
    assert(st.getAs[Long]("para_chars") == 19)
    assert(st.getAs[Long]("dup_para_chars") == 0)
    assert(st.getAs[Long]("tok_chars") == 10)
    // 2-grams: "x y"×4 dominates → 4·2; 3-grams: xyx/yxy both ×3 → 3·3;
    // 4-grams: xyxy×3 → 3·4
    assert(st.getAs[Long]("top2_chars") == 8)
    assert(st.getAs[Long]("top3_chars") == 9)
    assert(st.getAs[Long]("top4_chars") == 12)
    // 5-grams: xyxyx×2 + yxyxy×2 → 20; 6-grams: xyxyxy×2 → 12; 7+ distinct
    assert(st.getAs[Long]("dup5_chars") == 20)
    assert(st.getAs[Long]("dup6_chars") == 12)
    assert(st.getAs[Long]("dup7_chars") == 0)
    assert(st.getAs[Long]("dup10_chars") == 0)
    // null text → null struct
    val n = Seq((2L, Option.empty[String])).toDF("doc_id", "text")
      .select(gopherRepetitionStats(col("text")).as("s")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("gopherRepetitionRules: repetitive pages drop, diverse prose passes") {
    def passes(t: String): Boolean =
      Seq((1L, t)).toDF("doc_id", "text")
        .where(gopherRepetitionRules(col("text"))).count() == 1
    // a page-sized diverse doc (the published thresholds assume ≥50-word
    // pages: with all-distinct grams top-gram coverage is one gram's
    // length, a small fraction only of a LONG page)
    val diverse = ((1 to 40).map(i => f"w$i%02d").mkString(" ") + "\n" +
      (41 to 50).map(i => f"w$i%02d").mkString(" "))
    assert(passes(diverse))
    // "x y" holds 80% of 2-gram coverage → top2 rule fires
    assert(!passes("x y x y\nx y x y\nz w"))
    // duplicated LINES with diverse grams: line rules fire, gram rules do not
    val dupLines = Seq("alpha beta gamma one", "alpha beta gamma one",
      "alpha beta gamma one", "delta epsilon zeta").mkString("\n")
    assert(!passes(dupLines))
    // empty text passes trivially (0 <= 0 everywhere)
    assert(passes(""))
  }

  test("c4CleanLines: terminal punct, three words, javascript marker; null stays null") {
    val text = Seq(
      "This line survives the filter.",      // keeps: punct + 3 words
      "Too short.",                          // drops: 2 words
      "No terminal punctuation here",        // drops: no . ! ? "
      "Enable JavaScript to view comments.", // drops: marker, case-insensitive
      "Does it survive a question mark?",    // keeps
      "He said \"stop right there.\"",       // keeps: ends in a quote
      "Ends with a bang!  ").mkString("\n")  // keeps: rtrim before the check
    val out = Seq((1L, text)).toDF("doc_id", "text")
      .select(c4CleanLines(col("text")).as("t")).collect()(0).getString(0)
    assert(out == Seq(
      "This line survives the filter.",
      "Does it survive a question mark?",
      "He said \"stop right there.\"",
      "Ends with a bang!  ").mkString("\n"), s"got:\n$out")
    // fully boilerplate page → empty string; null text → null
    val empty = Seq((2L, "nav menu\nhome about contact")).toDF("doc_id", "text")
      .select(c4CleanLines(col("text")).as("t")).collect()(0).getString(0)
    assert(empty == "")
    val n = Seq((3L, Option.empty[String])).toDF("doc_id", "text")
      .select(c4CleanLines(col("text")).as("t")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("c4PageRules: lorem ipsum and braces read the RAW page, sentences the cleaned one") {
    def passes(raw: String): Boolean = {
      val d = Seq((1L, raw)).toDF("doc_id", "text")
      d.where(c4PageRules(col("text"), c4CleanLines(col("text")))).count() == 1
    }
    val five = (1 to 5).map(i => s"This is sentence number $i today.").mkString("\n")
    assert(passes(five))
    assert(!passes(five + "\nSome Lorem Ipsum filler text."), "lorem ipsum page-drops")
    assert(!passes(five + "\nif (x) { return; }"), "brace page-drops even when line cleaning strips it")
    assert(!passes((1 to 4).map(i => s"This is sentence number $i today.").mkString("\n")),
      "fewer than 5 sentences")
    // intra-line sentence breaks count toward the floor
    assert(passes("One here. Two here. Three here. Four here. And a fifth one."))
  }

  test("dedupLinesWithin: first occurrence survives, order preserved, blanks dedup") {
    val text = "header\nbody one\nheader\nbody two\n\nbody one\n\ntail"
    val out = Seq((1L, text)).toDF("doc_id", "text")
      .select(dedupLinesWithin(col("text")).as("t")).collect()(0).getString(0)
    assert(out == "header\nbody one\nbody two\n\ntail", s"got:\n$out")
    val n = Seq((2L, Option.empty[String])).toDF("doc_id", "text")
      .select(dedupLinesWithin(col("text")).as("t")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("htmlToText: payload tags removed with contents; block closers become lines; entities decode in the pinned order") {
    val html = "<html><head><title>T</title>" +
      "<style type=\"text/css\">body { color: red }</style>" +
      "<script>var x = \"<p>not text</p>\";</script></head>" +
      "<body><!-- nav\nblock --><h1>Big News</h1>" +
      "<p>First  para with <b>bold</b> &amp; &quot;quotes&quot;.</p>" +
      "<div>5 &lt; 6 &gt; 4, it&#39;s&nbsp;fine</div>" +
      "<p>Literal: &amp;lt; stays</p>" +
      "line one<br>line two</body></html>"
    val out = Seq((1L, html)).toDF("doc_id", "text")
      .select(htmlToText(col("text")).as("t")).collect()(0).getString(0)
    val expected = "T Big News\n" +
      "First para with bold & \"quotes\".\n" +
      "5 < 6 > 4, it's fine\n" +
      "Literal: &lt; stays\n" +
      "line one\nline two"
    assert(out == expected, s"got:\n$out")
    // script CONTENT is gone (a tag-only strip would leak 'not text')
    assert(!out.contains("color: red") && !out.contains("var x"))
    // null in, null out
    val n = Seq((2L, Option.empty[String])).toDF("doc_id", "text")
      .select(htmlToText(col("text")).as("t")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("htmlToText feeds line-based gates: stripBoilerplate sees real lines") {
    val html = "<p>This is a long enough real sentence of prose.</p>" +
      "<div>(c) 2026</div><p>Another real sentence with many words here.</p>"
    val out = Seq((1L, html)).toDF("doc_id", "text")
      .select(stripBoilerplate(htmlToText(col("text"))).as("t"))
      .collect()(0).getString(0)
    assert(out == "This is a long enough real sentence of prose.\n" +
      "Another real sentence with many words here.", s"got:\n$out")
  }

  test("fixMojibake: repairs UTF-8-as-Latin-1/cp1252 damage, never touches healthy text") {
    val cases = Seq(
      // e-acute double-encoded: C3 A9 read as latin1
      (1L, "caf\u00C3\u00A9", "caf\u00E9"),
      // right single quote through cp1252: E2 80 99 -> a-circ,euro,tm
      (2L, "it\u00E2\u20AC\u2122s fine", "it\u2019s fine"),
      // double quotes; closing 9D byte is undefined in cp1252 and
      // arrives as the raw control char
      (3L, "\u00E2\u20AC\u0153q\u00E2\u20AC\u009D", "\u201Cq\u201D"),
      // TRUE latin-1 prose: no signature, stays
      (4L, "na\u00EFve r\u00E9sum\u00E9", "na\u00EFve r\u00E9sum\u00E9"),
      // mixed CJK + mojibake: repair would destroy the CJK, so stay
      (5L, "\u4E2D\u6587 caf\u00C3\u00A9", "\u4E2D\u6587 caf\u00C3\u00A9"),
      // plain ascii: no signature, stays
      (6L, "plain ascii text.", "plain ascii text."))
    val out = cases.map { case (i, in, _) => (i, in) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), fixMojibake(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (i, in, want) =>
      assert(out(i) == want, s"case $i: '$in' -> '${out(i)}' wanted '$want'")
    }
    val n = Seq((9L, Option.empty[String])).toDF("doc_id", "text")
      .select(fixMojibake(col("text"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("sentenceSplit: terminal marks stay, multi-mark boundaries, no-boundary text, empties drop") {
    val got = Seq(
      (1L, "First one. Second two!  Third?! Fourth"),
      (2L, "no terminal punctuation here"),
      (3L, "Trailing dot."),
      (4L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), sentenceSplit(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[String]](1).toSeq).toMap
    assert(got(1L) == Seq("First one.", "Second two!", "Third?!", "Fourth"))
    assert(got(2L) == Seq("no terminal punctuation here"))
    assert(got(3L) == Seq("Trailing dot."))
    assert(got(4L) == Seq.empty)
  }

  /** Labeled language-ID fixture (r10 VERDICT ask #6): ten natural
    * sentences per language, written to lean on ordinary function words
    * rather than the marker lists themselves, plus unambiguous junk.
    * langId gates three screens — a per-language accuracy floor makes a
    * heuristic regression loud instead of silently rotting them. */
  lazy val langFixture: Seq[(String, String)] = LangFixture.sentences

  test("hashingTfVector: counts partition the tokens; deterministic; dims validated") {
    val d = Seq((1L, "cat dog cat!"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vecs = d.select(col("doc_id"), hashingTfVector(col("text"), 8).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    val v1 = vecs(1L).get
    assert(v1.length == 8 && v1.sum == 3.0, "every token lands in exactly one bucket")
    assert(v1.count(_ > 0) <= 2, "two distinct tokens → at most two buckets")
    assert(vecs(2L).get.sum == 0.0)
    assert(vecs(3L).isEmpty || vecs(3L).get == null || vecs(3L).get.sum == 0.0)
    // same text → same vector at any partitioning (pure expression)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").where(col("text").isNotNull)
    val a = docs.select(col("doc_id"), hashingTfVector(col("text"), 32).as("v"))
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    val b = docs.repartition(13)
      .select(col("doc_id"), hashingTfVector(col("text"), 32).as("v"))
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
    intercept[IllegalArgumentException] { hashingTfVector(col("text"), 0) }
  }

  test("hashingTfVector native kernel == the higher-order filter-count form") {
    // the r13 optimization swapped the O(dim·tokens) transform/filter
    // form for the one-pass BucketCountsExpr; this pins bit-equality of
    // the two forms on real text (counts are exact integers — any
    // divergence is a hard miscount, not float noise)
    import graft.functions.TextFunctions.{normalizeText, portableHash, tokens}
    val dim = 16
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = transform(tokens(normalizeText(col("text"))),
      t => pmod(portableHash(t), lit(dim)))
    val hof = transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(idx, x => x === i)).cast("double"))
    val rows = docs.select(col("doc_id"),
        hashingTfVector(col("text"), dim).as("native"), hof.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Option(r.getSeq[Double](1)) == Option(r.getSeq[Double](2)),
        s"doc ${r.getLong(0)}: native != higher-order form")
    }
  }

  test("langId accuracy on the labeled fixture: per-language floors") {
    val preds = langFixture.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("id", "truth", "text")
      .select(col("truth"), langId(col("text")).as("pred"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val byLang = preds.groupBy(_._1).view
      .mapValues(ps => ps.count(p => p._2 == p._1).toDouble / ps.size).toMap
    // floors pinned just under the measured accuracy at spec-authoring
    // time — a marker-list or tokenizer regression trips them loudly
    Seq("en", "de", "es", "fr", "it").foreach { l =>
      assert(byLang(l) >= 0.9, s"$l accuracy ${byLang(l)} (${preds.filter(_._1 == l).mkString(", ")})")
    }
    assert(byLang("und") == 1.0, s"junk must stay und: ${byLang("und")}")
  }

  test("foldConfusables: homoglyphs fold to Latin skeletons; mapping is 1:1 and idempotent") {
    import graft.functions.TextFunctions
    // mapping invariants: distinct sources, 1:1, no Latin chars as sources
    val pairs = TextFunctions.ConfusablePairs
    assert(pairs.map(_._1).distinct.size == pairs.size)
    assert(pairs.forall { case (src, dst) => src > 0x7F && dst <= 'z' })
    val d2 = Seq(
      // "paypal" spelled with Cyrillic а/р and Greek omicron lookalikes
      "p\u0430yp\u0430l \u043Effers", // раураl offers
      "plain ascii text").toDF("text")
    val got = d2.select(foldConfusables(col("text")).as("v"))
      .collect().map(_.getString(0))
    assert(got(0) == "paypal offers", got(0))
    assert(got(1) == "plain ascii text") // identity on ASCII
    // idempotent: folding twice == folding once
    val twice = d2.select(foldConfusables(foldConfusables(col("text"))).as("v"))
      .collect().map(_.getString(0))
    assert(twice.toSeq == got.toSeq)
  }

  test("Luhn card redaction: valid numbers redact, invalid and short runs survive") {
    import graft.functions.TextFunctions
    // 4111111111111111 is the canonical Luhn-valid test number
    assert(TextFunctions.luhnValid("4111111111111111"))
    assert(TextFunctions.luhnValid("4111 1111 1111 1111"))
    assert(!TextFunctions.luhnValid("4111111111111112"))
    assert(!TextFunctions.luhnValid("1234"))
    assert(TextFunctions.luhnCheckDigit("411111111111111") == 1)
    val d2 = Seq(
      "pay 4111 1111 1111 1111 now",       // valid, separated
      "call 4111111111111112 maybe",       // 16 digits but Luhn-invalid
      "order 123456789 units").toDF("text") // 9 digits: not a card
    val got = d2.select(redactCards(col("text")).as("v"))
      .collect().map(_.getString(0))
    assert(got(0) == "pay <CARD> now", got(0))
    assert(got(1) == "call 4111111111111112 maybe") // invalid survives
    assert(got(2) == "order 123456789 units")
    // the strict chain still catches the leftovers via the 9+ digit rule
    val strict = d2.select(redactPiiStrict(col("text")).as("v"))
      .collect().map(_.getString(0))
    assert(strict(0) == "pay <CARD> now")
    assert(strict(1) == "call <NUMBER> maybe")
    assert(strict(2) == "order <NUMBER> units")
  }

  test("compressionRatio: repetitive text compresses below prose, noise above; deterministic") {
    import graft.functions.TextFunctions.compressionRatio
    val d2 = Seq(
      ("spam", ("buy now " * 200).trim),
      ("prose", "the committee reviewed the quarterly report and concluded that " +
        "further analysis of regional variations would strengthen the findings " +
        "before any recommendation reaches the board next spring " * 3),
      ("noise", (1 to 200).map(i => Integer.toHexString(i * 2654435761L.toInt)).mkString(" ")),
      ("empty", "")).toDF("kind", "text")
    val r = d2.select(col("kind"), compressionRatio(col("text")).as("r"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("spam") < r("prose"), s"spam ${r("spam")} vs prose ${r("prose")}")
    assert(r("prose") < r("noise"), s"prose ${r("prose")} vs noise ${r("noise")}")
    assert(r("spam") < 0.2 && r("noise") > 0.4, r.toString)
    assert(r("empty") == 1.0)
    // deterministic across runs
    val again = d2.select(compressionRatio(col("text")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(again == d2.select(compressionRatio(col("text")).as("r"))
      .collect().map(_.getDouble(0)).toSeq)
  }
}
