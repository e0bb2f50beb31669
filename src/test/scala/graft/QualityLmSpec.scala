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

  test("Kneser–Ney: hand-computed probabilities (seen, discount floor, unseen context)") {
    // ref docs "a b", "a b", "b c": vocab {a, b, c} (V=3);
    // bigrams (a,b)=2, (b,c)=1; ctx a:(c1=2,n1c=1), b:(c1=1,n1c=1);
    // rights b:1, c:1; T=2; pCont denominator T+V+1 = 6.
    //   p(b|a) = (2−.75)/2 + (.75·1/2)·(1+1)/6 = 0.625 + 0.125 = 0.75
    //   p(c|b) = (1−.75)/1 + (.75·1/1)·(1+1)/6 = 0.25  + 0.25  = 0.5
    //   p(a|c): context c unseen (c1=0) → pCont(a) = (0+1)/6
    val model = QualityLm.fitKn(
      Seq((1L, "a b"), (2L, "a b"), (3L, "b c")).toDF("doc_id", "text"),
      "text", vocabSize = 16)
    assert(model.vocabSize == 3 && model.distinctBigrams == 2L)
    val Array(row) = QualityLm.scoreKn(
      Seq((5L, "a b c a")).toDF("doc_id", "text"), "text", "doc_id", model)
      .collect()
    assert(row.getLong(1) == 3L)
    val h = -(math.log(0.75) + math.log(0.5) + math.log(1.0 / 6.0)) /
      math.log(2.0) / 3.0
    assert(row.getDouble(2) == math.floor(h * 1e4 + 0.5) / 1e4)
  }

  test("Kneser–Ney downweights frequent-but-context-bound continuations") {
    // "francisco" appears often but ONLY after "san"; "road" appears the
    // same number of times after many different contexts. KN's
    // continuation probability ranks road above francisco in a NOVEL
    // context, where raw-frequency add-one smoothing cannot tell them
    // apart — the defining property of the smoothing.
    val ref = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "main road old road new road long road")
    ).toDF("doc_id", "text")
    val model = QualityLm.fitKn(ref, "text", vocabSize = 32)
    // OOV context (<unk>, unseen: c1=0) isolates pCont: francisco's
    // continuation count is 1 (it only ever follows 'san') while road's
    // is 4 (main/old/new/long) — despite equal raw frequency (4 each).
    val probe = Seq((10L, "qqq francisco"), (11L, "qqq road"))
      .toDF("doc_id", "text")
    val out = QualityLm.scoreKn(probe, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(11L) < out(10L),
      s"high-continuation token must score better in a novel context: $out")
  }

  test("Kneser–Ney contracts: discount range, short docs dropped, partitioning-independent") {
    intercept[IllegalArgumentException] {
      QualityLm.fitKn(refDocs, "text", vocabSize = 16, discount = 1.5)
    }
    val model = QualityLm.fitKn(refDocs, "text", vocabSize = 16)
    val probe = Seq((1L, "single"), (2L, "the cat sat"), (3L, "the dog ate the fish"))
      .toDF("doc_id", "text")
    val a = QualityLm.scoreKn(probe, "text", "doc_id", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.map(_._1).sameElements(Array(2L, 3L))) // 1-token doc dropped
    val b = QualityLm.scoreKn(probe.repartition(7), "text", "doc_id", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
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

  test("perplexityBuckets: equal thirds per group on the (entropy, id) order") {
    val model = QualityLm.fit(refDocs, "text", vocabSize = 16)
    // 9 docs per group with strictly increasing garbledness so the
    // entropy order is stable; ids interleaved across groups
    val probe = (0L until 18L).map { i =>
      val junk = (0L to i / 2).map(j => s"zx${i}q$j").mkString(" ")
      (i, if (i % 2 == 0) "g1" else "g2", s"the cat sat $junk")
    }.toDF("doc_id", "grp", "text")
    val out = QualityLm.perplexityBuckets(probe, "text", "doc_id", "grp", model)
    val rows = out.select("doc_id", "grp", "entropy_bits", "ppl_rank", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4)))
    assert(rows.length == 18)
    rows.groupBy(_._2).foreach { case (g, rs) =>
      // rank is 1..n and ascending in (entropy, id)
      val sorted = rs.sortBy(r => (r._3, r._1))
      assert(sorted.map(_._4).toSeq == (1L to rs.length).toSeq, s"group $g ranks")
      // equal thirds: 9 docs -> 3/3/3
      val byBucket = rs.groupBy(_._5).view.mapValues(_.length).toMap
      assert(byBucket == Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"group $g: $byBucket")
      // head has the LOWEST entropies
      assert(sorted.take(3).forall(_._5 == "head"), s"group $g head order")
      assert(sorted.slice(3, 6).forall(_._5 == "middle"))
      assert(sorted.drop(6).forall(_._5 == "tail"))
    }
  }

  test("perplexityBuckets: partitioning-invariant; cumulative-cut and null-group contracts") {
    val model = QualityLm.fit(refDocs, "text", vocabSize = 16)
    val probe = (0L until 20L).map { i =>
      (i, if (i % 3 == 0) "a" else "b", s"the cat sat on mat $i then ran x$i")
    }.toDF("doc_id", "grp", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityLm.perplexityBuckets(df, "text", "doc_id", "grp", model)
        .select("doc_id", "ppl_rank", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run(probe) == run(probe.repartition(7)))
    // head fraction > mid fraction is rejected (cuts must be cumulative)
    val ex = intercept[IllegalArgumentException] {
      QualityLm.perplexityBuckets(probe, "text", "doc_id", "grp", model,
        headNum = 3, headDen = 4, midNum = 1, midDen = 2)
    }
    assert(ex.getMessage.contains("cumulative"))
    val nullG = Seq((1L, null.asInstanceOf[String], "two tokens here ok"))
      .toDF("doc_id", "grp", "text")
    val ex2 = intercept[IllegalArgumentException] {
      QualityLm.perplexityBuckets(nullG, "text", "doc_id", "grp", model).collect()
    }
    assert(ex2.getMessage.contains("null values in group column"))
  }

  test("Kneser–Ney bucketing: same-model map == single-model; per-group KN models win on their own group") {
    val modelA = QualityLm.fitKn(refDocs, "text", vocabSize = 16)
    val refB = Seq((1L, "zork blat quux zork blat"), (2L, "quux zork blat quux"))
      .toDF("doc_id", "text")
    val modelB = QualityLm.fitKn(refB, "text", vocabSize = 16)
    val probe = (0L until 12L).map { i =>
      (i, if (i % 2 == 0) "en" else "zz",
        if (i % 2 == 0) s"the cat sat on mat $i" else s"zork blat quux run $i")
    }.toDF("doc_id", "grp", "text")
    val uni = QualityLm.perplexityBucketsKn(probe, "text", "doc_id", "grp", modelA)
      .select("doc_id", "ppl_rank", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val mapped = QualityLm.perplexityBucketsByKn(probe, "text", "doc_id", "grp",
      Map("en" -> modelA, "zz" -> modelA))
      .select("doc_id", "ppl_rank", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(mapped == uni)
    val own = QualityLm.perplexityBucketsByKn(probe, "text", "doc_id", "grp",
      Map("en" -> modelA, "zz" -> modelB))
      .select("doc_id", "entropy_bits").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val under = QualityLm.perplexityBucketsByKn(probe, "text", "doc_id", "grp",
      Map("en" -> modelA, "zz" -> modelA))
      .select("doc_id", "entropy_bits").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val zzIds = (1L until 12L by 2)
    assert(zzIds.forall(i => own(i) < under(i)),
      s"own-model KN entropies should beat wrong-model: ${zzIds.map(i => (own(i), under(i)))}")
    intercept[IllegalArgumentException] {
      QualityLm.perplexityBucketsByKn(probe, "text", "doc_id", "grp",
        Map("en" -> modelA, "fr" -> modelA))
    }
  }

  test("perplexityBucketsBy: per-group models; same-model map == single-model bucketing; contracts") {
    val modelA = QualityLm.fit(refDocs, "text", vocabSize = 16)
    // a second reference with a disjoint vocabulary
    val refB = Seq((1L, "zork blat quux zork blat"), (2L, "quux zork blat quux"))
      .toDF("doc_id", "text")
    val modelB = QualityLm.fit(refB, "text", vocabSize = 16)
    val probe = (0L until 12L).map { i =>
      (i, if (i % 2 == 0) "en" else "zz",
        if (i % 2 == 0) s"the cat sat on mat $i" else s"zork blat quux run $i")
    }.toDF("doc_id", "grp", "text")
    // same model for every group == the single-model operator
    val uni = QualityLm.perplexityBuckets(probe, "text", "doc_id", "grp", modelA)
      .select("doc_id", "ppl_rank", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val mapped = QualityLm.perplexityBucketsBy(probe, "text", "doc_id", "grp",
      Map("en" -> modelA, "zz" -> modelA))
      .select("doc_id", "ppl_rank", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(mapped == uni)
    // per-group models: the zz docs score LOWER under their own model
    // than under the English one
    val own = QualityLm.perplexityBucketsBy(probe, "text", "doc_id", "grp",
      Map("en" -> modelA, "zz" -> modelB))
      .select("doc_id", "grp", "entropy_bits").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val under = QualityLm.perplexityBucketsBy(probe, "text", "doc_id", "grp",
      Map("en" -> modelA, "zz" -> modelA))
      .select("doc_id", "entropy_bits").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val zzIds = (1L until 12L by 2)
    assert(zzIds.forall(i => own(i) < under(i)),
      s"own-model entropies should beat wrong-model: ${zzIds.map(i => (own(i), under(i)))}")
    // unmodeled groups are DROPPED; modeled-but-absent groups fail loud
    val dropped = QualityLm.perplexityBucketsBy(probe, "text", "doc_id", "grp",
      Map("en" -> modelA))
    assert(dropped.select("grp").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
    val ex = intercept[IllegalArgumentException] {
      QualityLm.perplexityBucketsBy(probe, "text", "doc_id", "grp",
        Map("en" -> modelA, "nope" -> modelB))
    }
    assert(ex.getMessage.contains("absent from the data"))
  }
}
