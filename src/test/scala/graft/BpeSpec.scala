package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** BPE: the Sennrich merge order on the classic low/lower/lowest
  * fixture (hand-derived), deterministic ties, distributed apply ==
  * driver encode, and the fit's partitioning independence. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-derived merge order on low/lower/lowest") {
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val m = Bpe.fit(docs, "text", numMerges = 5)
    // counts: low×3, lower×1, lowest×1 → pairs (l,o):5 (o,w·):3 (o,w):2
    // (w,e):2 ... merge 1 = (l,o); then (lo,w·):3 beats (lo,w):2;
    // tie (lo,w)=2 vs (w,e)=2 breaks lexicographic → (lo,w); then
    // (low,e):2; then ties at 1 break to (lowe,r·).
    assert(m.merges == Seq(("l", "o"), ("lo", "w·"), ("lo", "w"),
      ("low", "e"), ("lowe", "r·")))
    assert(m.encodeWord("low") == Seq("low·"))
    assert(m.encodeWord("lowest") == Seq("lowe", "s", "t·"))
    // unseen word segments through learned prefixes, never throws
    assert(m.encodeWord("lows") == Seq("low", "s·"))
    assert(m.encodeWord("") == Seq.empty)
  }

  test("fit is deterministic and partitioning-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.fit(docs, "text", numMerges = 50)
    val b = Bpe.fit(docs.repartition(13), "text", numMerges = 50)
    assert(a.merges == b.merges)
  }

  test("distributed tokenize equals driver-side encodeWord per word") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Bpe.fit(docs, "text", numMerges = 100)
    val sample = docs.orderBy("doc_id").limit(20)
      .select(col("doc_id"), col("text"),
        Bpe.tokenize(col("text"), m).as("toks"))
      .collect()
    sample.foreach { r =>
      val words = graft.functions.TextFunctions.tokens(lit(r.getString(1)))
      val expected = spark.range(1).select(words.as("w")).head
        .getSeq[String](0).flatMap(m.encodeWord)
      assert(r.getSeq[String](2) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("token count bounds: words <= bpe tokens <= characters+words") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Bpe.fit(docs, "text", numMerges = 100)
    val bad = docs.select(
      graft.functions.TextFunctions.tokenCount(col("text")).as("nw"),
      Bpe.tokenCount(col("text"), m).as("nb"),
      length(col("text")).as("nc"))
      .where(col("nb") < col("nw") || col("nb") > col("nc") + col("nw"))
    assert(bad.count() == 0)
  }

  test("more merges never increase the token count") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m50 = Bpe.fit(docs, "text", numMerges = 50)
    val m200 = Bpe.fit(docs, "text", numMerges = 200)
    // merge lists are prefix-consistent (greedy order is stable)
    assert(m200.merges.take(m50.merges.length) == m50.merges)
    val counts = docs.select(
      Bpe.tokenCount(col("text"), m50).as("a"),
      Bpe.tokenCount(col("text"), m200).as("b"))
      .where(col("b") > col("a"))
    assert(counts.count() == 0)
  }

  // ---------------- byte-level (GPT-2 recipe) ----------------

  test("byte alphabet: the GPT-2 bijection with its known anchor points") {
    assert(Bpe.ByteToChar.length == 256)
    assert(Bpe.ByteToChar.distinct.length == 256, "must be a bijection")
    assert(Bpe.ByteToChar('a'.toInt) == 'a') // visible bytes map to themselves
    assert(Bpe.ByteToChar(32) == 'Ġ') // space → Ġ
    assert(Bpe.ByteToChar(10) == 'Ċ') // newline → Ċ
    assert(Bpe.ByteToChar(0) == 'Ā') // first invisible byte
    (0 until 256).foreach(b => assert(Bpe.CharToByte(Bpe.ByteToChar(b)) == b))
    // unitHex round-trips through the hex(encode()) form the oracle uses
    assert(Bpe.unitHex(Bpe.byteUnits(" low").mkString) == "206C6F77")
  }

  test("pretokenize: GPT-2 arms, contractions, whitespace donation") {
    assert(Bpe.pretokenize("hello world") == Seq("hello", " world"))
    assert(Bpe.pretokenize("don't stop") == Seq("don", "'t", " stop"))
    assert(Bpe.pretokenize("it's 2 cats!!") ==
      Seq("it", "'s", " 2", " cats", "!!"))
    // multi-space run donates its last space to the following word
    assert(Bpe.pretokenize("a  b") == Seq("a", " ", " b"))
    // a non-space whitespace char never attaches — it is its own token
    assert(Bpe.pretokenize("x\ny") == Seq("x", "\n", "y"))
    assert(Bpe.pretokenize("x\n\ny") == Seq("x", "\n", "\n", "y"))
    // trailing whitespace stays one run
    assert(Bpe.pretokenize("x  ") == Seq("x", "  "))
    assert(Bpe.pretokenize("") == Seq.empty)
    assert(Bpe.pretokenize(null) == Seq.empty)
    // U+000B (vertical tab) is NOT whitespace to the pretokenizer:
    // Java \s includes it but RE2 (the oracle engine) does not, so
    // PretokenRegex spells the class out and U+000B lands in the punct
    // arm in both engines, optional leading space included.
    assert(Bpe.pretokenize("a\u000Bb") == Seq("a", "\u000B", "b"))
    assert(Bpe.pretokenize("x \u000By") == Seq("x", " \u000B", "y"))
    assert(Bpe.pretokenize("a \u000B") == Seq("a", " \u000B"))
    // non-ASCII text survives byte-mapping round trips
    val units = Bpe.byteUnits("café")
    assert(units.length == 5, "é is two UTF-8 bytes")
  }

  test("byte-level golden merges on the low/lower/lowest fixture") {
    val docs = Seq("low low low lower lowest").toDF("text")
    val m = Bpe.fitBytes(docs, "text", numMerges = 5)
    // pretokens: low×1, " low"×2, " lower"×1, " lowest"×1 (Ġ = space)
    // pairs: (l,o):5 (o,w):5 (Ġ,l):4 (w,e):2 … → tie at 5 breaks
    // lexicographic to (l,o); then (lo,w):5; (Ġ,low):4; (Ġlow,e):2;
    // final tie at 1 breaks to (s,t) ('s' < 'Ġ' U+0120).
    val g = "Ġ"
    assert(m.merges == Seq(("l", "o"), ("lo", "w"), (g, "low"),
      (g + "low", "e"), ("s", "t")))
    assert(m.encodeUnits(Bpe.byteUnits(" lowest")) == Seq(g + "lowe", "st"))
    assert(m.encodeUnits(Bpe.byteUnits(" low")) == Seq(g + "low"))
    assert(m.encodeUnits(Bpe.byteUnits("low")) == Seq("low"))
  }

  test("fitBytes is deterministic and partitioning-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.fitBytes(docs, "text", numMerges = 50)
    val b = Bpe.fitBytes(docs.repartition(13), "text", numMerges = 50)
    assert(a.merges == b.merges)
  }

  test("byte-level round trip: detokenizeBytes ∘ tokenizeBytes == identity") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Bpe.fitBytes(docs, "text", numMerges = 60)
    val bad = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        Bpe.detokenizeBytesCol(Bpe.tokenizeBytes(col("text"), m)).as("rt"))
      .where(!(col("rt") <=> col("text")))
    assert(bad.count() == 0, "byte-level BPE must be lossless")
    // driver-side goldens including the whitespace arms and non-ASCII
    Seq("hello  world\n\nnew paragraph", "don't — it's café ☕ №5",
      "a\tb  c   d", "", "   ", "a \u000Bb\u000B\u000B c").foreach { t =>
      val toks = Bpe.pretokenize(t).flatMap(w => m.encodeUnits(Bpe.byteUnits(w)))
      assert(Bpe.detokenizeBytes(toks) == t, s"round trip failed for ${t.map(_.toInt)}")
    }
  }

  test("distributed tokenizeBytes equals driver-side encode per pretoken") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Bpe.fitBytes(docs, "text", numMerges = 100)
    val sample = docs.orderBy("doc_id").limit(20)
      .select(col("doc_id"), col("text"),
        Bpe.tokenizeBytes(col("text"), m).as("toks"))
      .collect()
    sample.foreach { r =>
      val expected = Bpe.pretokenize(r.getString(1))
        .flatMap(w => m.encodeUnits(Bpe.byteUnits(w)))
      assert(r.getSeq[String](2) == expected, s"doc ${r.getLong(0)}")
    }
  }
}
