package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityLm

class QualityLmSpec extends SparkSpec {
  import spark.implicits._

  private def refDocs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "the dog sat on the rug")
  ).toDF("doc_id", "text")

  test("reference-like text scores lower entropy than garbage") {
    val model = QualityLm.fit(refDocs, "text", vocabSize = 16)
    val probe = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "zxq qqj vbn wrt plk mnz")
    ).toDF("doc_id", "text")
    val out = QualityLm.score(probe, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) < out(11L),
      s"in-domain text must score below noise: $out")
  }

  test("hand-computed entropy for a one-transition doc") {
    // model over one ref doc "a b a b": ACTUAL vocab {a, b} (the cap is
    // an upper bound, the event space is |vocab|+1 = 3); bigrams
    // (a,b)=2, (b,a)=1; contexts a=2, b=1.
    // doc "a b": p(b|a) = (2+1)/(2+3) = 3/5
    val model = QualityLm.fit(Seq((1L, "a b a b")).toDF("doc_id", "text"),
      "text", vocabSize = 16)
    assert(model.vocabSize == 2)
    val Array(row) = QualityLm.score(
      Seq((5L, "a b")).toDF("doc_id", "text"), "text", "doc_id", model)
      .collect()
    assert(row.getLong(1) == 1L)
    val expected = math.floor(-math.log(3.0 / 5.0) / math.log(2.0) * 1e4 + 0.5) / 1e4
    assert(row.getDouble(2) == expected)
  }

  test("unseen context falls back to the uniform 1/(V+1) floor") {
    val model = QualityLm.fit(Seq((1L, "a b a b")).toDF("doc_id", "text"),
      "text", vocabSize = 16)
    // "z z": both tokens OOV -> <unk>; context <unk> unseen in ref,
    // so p = (0+1)/(0+3) exactly
    val Array(row) = QualityLm.score(
      Seq((5L, "z z")).toDF("doc_id", "text"), "text", "doc_id", model)
      .collect()
    val expected = math.floor(math.log(3.0) / math.log(2.0) * 1e4 + 0.5) / 1e4
    assert(row.getDouble(2) == expected)
  }

  test("degenerate inputs: short docs dropped, empty ref still scores") {
    val model = QualityLm.fit(refDocs, "text", vocabSize = 16)
    val probe = Seq((1L, "single"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val out = QualityLm.score(probe, "text", "doc_id", model)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L),
      "docs with <2 tokens have no transitions to score")
    // an empty reference degenerates to the single-event <unk> universe
    // (p = 1, entropy 0), not a crash
    val emptyModel = QualityLm.fit(refDocs.where(lit(false)), "text", 16)
    assert(emptyModel.vocab.isEmpty)
    val scored = QualityLm.score(probe, "text", "doc_id", emptyModel)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored == Map(3L -> 0.0))
  }

  test("scoring is partitioning-independent") {
    val model = QualityLm.fit(refDocs, "text", vocabSize = 16)
    val probe = (1L to 50L).map(i => (i, s"the cat sat on mat $i then ran"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityLm.score(df, "text", "doc_id", model)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(probe) == run(probe.repartition(7)))
  }
}
