package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence packing: budget respected, offsets contiguous per pack,
  * over-long docs isolated, layout deterministic across partitionings. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Int) = (id, Seq.fill(words)("w").mkString(" "))

  test("greedy layout: budget respected, offsets contiguous, overflow opens a pack") {
    // stream 0 (ids 0,2,4,6): 3+4 fit in 8, 5 overflows, 2 follows 5
    val docs = Seq(doc(0, 3), doc(2, 4), doc(4, 5), doc(6, 2)).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "text", "doc_id", budgetTokens = 8, streams = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((0L, 0L, 3L)))
    assert(out(4L) == ((0L, 1L, 0L))) // 3+4+5 > 8 → next pack
    assert(out(6L) == ((0L, 1L, 5L)))
  }

  test("a document longer than the whole budget is placed alone at offset 0") {
    val docs = Seq(doc(1, 20), doc(3, 2), doc(5, 2)).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "text", "doc_id", budgetTokens = 8, streams = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((0L, 0L)))  // oversize doc owns pack 0
    assert(out(3L) == ((1L, 0L)))  // next doc must not share it
    assert(out(5L) == ((1L, 2L)))
  }

  test("invariants + determinism across partitionings on a generated corpus") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", array_repeat(lit("tok"), (pmod(col("id"), lit(37)) + 1).cast("int")))
        .as("text"))
    def layout(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, "text", "doc_id", budgetTokens = 64, streams = 4)
    val a = layout(docs).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val b = layout(docs.repartition(13)).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(a == b, "layout must not depend on input partitioning")
    // every pack's docs tile it: offsets sorted, each next = prev + ntok,
    // and no multi-doc pack exceeds the budget
    a.groupBy(t => (t._2, t._3)).foreach { case ((stream, pack), docsIn) =>
      val sorted = docsIn.toSeq.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Seq((_, _, _, o1, n1), (_, _, _, o2, _)) => assert(o2 == o1 + n1,
          s"gap in stream=$stream pack=$pack")
        case _ =>
      }
      val total = sorted.map(_._5).sum
      assert(docsIn.size == 1 || total <= 64,
        s"multi-doc pack over budget: stream=$stream pack=$pack total=$total")
    }
    // stream assignment is id mod streams
    a.foreach { case (id, stream, _, _, _) => assert(stream == id % 4) }
  }

  test("packSequencesBy: custom token denomination — parity with default, BPE budgets bite") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def layout(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // whitespace denomination through the By-form is the SAME layout
    val viaBy = layout(Packing.packSequencesBy(docs,
      graft.functions.TextFunctions.tokenCount(col("text")), "doc_id", 256, 8))
    assert(viaBy == layout(Packing.packSequences(docs, "text", "doc_id", 256, 8)))
    // BPE denomination at 40 merges (200 fully merges this synthetic
    // corpus' ~31-word vocab back to one token per word): per-doc
    // counts inflate vs whitespace, so the layout genuinely re-packs —
    // and every multi-doc pack still fits the budget in BPE tokens
    val model = graft.functions.Bpe.fit(docs, "text", numMerges = 40)
    val bpe = layout(Packing.packSequencesBy(docs,
      graft.functions.Bpe.tokenCount(col("text"), model), "doc_id", 256, 8))
    assert(bpe != viaBy, "BPE counts must change the layout for the gate to bite")
    bpe.groupBy(t => (t._2, t._3)).foreach { case ((stream, pack), docsIn) =>
      val total = docsIn.toSeq.map(_._5).sum
      assert(docsIn.size == 1 || total <= 256,
        s"multi-doc pack over BPE budget: stream=$stream pack=$pack total=$total")
    }
  }

  test("packingStats: hand-checked utilization; oversize docs can exceed 1") {
    // stream 0: docs of 3,4,5,2 tokens at budget 8 → packs (3+4),(5+2):
    // 2 packs, 14 tokens, utilization 14/16 = 0.875
    val docs = Seq(doc(0, 3), doc(2, 4), doc(4, 5), doc(6, 2)).toDF("doc_id", "text")
    val row = Packing.packingStats(docs, "text", "doc_id", budgetTokens = 8, streams = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(row.toSeq == Seq((0L, 2L, 14L, 0.875)))
    // an oversize doc alone in its pack pushes utilization past 1
    val over = Seq(doc(1, 20)).toDF("doc_id", "text")
    val o = Packing.packingStats(over, "text", "doc_id", budgetTokens = 8, streams = 1)
      .collect().head
    assert(o.getLong(1) == 1L && o.getDouble(3) == 2.5)
  }

  private def numbered(id: Long, words: Int) =
    (id, (1 to words).map(i => s"t$i").mkString(" "))

  test("chunkWindows: whole-doc chunk when short, overlapping windows when long") {
    val docs = Seq(numbered(1, 5), numbered(2, 10), numbered(3, 0)).toDF("doc_id", "text")
    val out = Packing.chunkWindows(docs, "text", "doc_id", maxTokens = 6, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 1 (5 toks ≤ 6): one whole-doc chunk
    assert(out((1L, 0L)) == ((5L, "t1 t2 t3 t4 t5")))
    // doc 2 (10 toks, stride 4): ceil((10-6)/4) = 1 extra window →
    // windows at 1 and 5; the second reaches the final token
    assert(out((2L, 0L)) == ((6L, "t1 t2 t3 t4 t5 t6")))
    assert(out((2L, 1L)) == ((6L, "t5 t6 t7 t8 t9 t10")))
    assert(!out.contains((2L, 2L)))
    // doc 3 (0 toks): no chunks
    assert(out.keys.map(_._1).toSet == Set(1L, 2L))
    // every consecutive pair shares exactly `overlap` tokens at the seam
    // (except a clamped final window, which may share more)
  }

  test("chunkWindows: zero overlap tiles the doc exactly") {
    val docs = Seq(numbered(7, 9)).toDF("doc_id", "text")
    val out = Packing.chunkWindows(docs, "text", "doc_id", maxTokens = 4, overlap = 0)
      .orderBy("chunk_ix")
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (4L, "t1 t2 t3 t4"), (4L, "t5 t6 t7 t8"), (1L, "t9")))
    // reconstruction: concatenating zero-overlap chunks yields the doc
    assert(out.map(_._2).mkString(" ") == numbered(7, 9)._2)
  }

  test("chunkWindows validates parameters and handles null text") {
    val docs = Seq((1L, Option("a b c")), (2L, Option.empty[String])).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkWindows(docs, "text", "doc_id", maxTokens = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkWindows(docs, "text", "doc_id", maxTokens = 0)
    }
    val out = Packing.chunkWindows(docs, "text", "doc_id", maxTokens = 4)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L), "null text → no chunks")
  }
}
