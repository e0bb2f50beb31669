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
}
