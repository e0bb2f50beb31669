package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** docs with an exact dup (1,2), a near-dup pair (3,4), and distinct (5). */
  lazy val docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "The quick brown fox jumps over the lazy dog near the river bank today!"),
    (3L, "spark query engines shuffle partition data across executors for joins and aggregations"),
    (4L, "spark query engines shuffle partition data across executors for joins and aggregation"),
    (5L, "completely different content about machine learning embeddings and vector search")
  ).toDF("doc_id", "text")

  test("exact dedup groups case/punctuation-normalized duplicates") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 4) // 1+2 merge
    val dupGroup = groups.find(_.getAs[Long]("n_docs") == 2).get
    assert(dupGroup.getAs[Long]("canonical_id") == 1L)
    val kept = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds near-dup pairs and dedup drops the larger id") {
    val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id", jaccardThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing exact-dup pair, got $pairs")
    assert(pairs.contains((3L, 4L)), s"missing near-dup pair, got $pairs")
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
    val kept = Dedup.minHashLshDedup(docs, "text", "doc_id", jaccardThreshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 5L))
  }

  test("simhash pairs near-identical token sets within hamming distance") {
    // one changed token out of ~28: few sign flips -> small hamming distance
    val longDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two three four"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two three five"),
      (3L, "totally unrelated words about database engines and streaming watermark state")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(longDocs, "text", "doc_id", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), s"got ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 16))
    assert(!pairs.exists(p => p._2 == 3L && p._3 == 0))
    // identical docs -> distance 0
    val same = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(same == Set((1L, 2L)))
  }

  test("word-ngram jaccard pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0)) // identical after norm
    assert(pairs.exists(p => p._1 == 3L && p._2 == 4L && p._3 > 0.5 && p._3 < 1.0))
  }

  test("nearDupAgainst screens probes against a frozen corpus; degenerate edges") {
    // 2 near-dups 1, 4 near-dups 3, 5 matches nothing
    val probe = docs.where(col("doc_id").isin(2L, 5L))
    val corpus = docs.where(col("doc_id").isin(1L, 3L))
    val hits = Dedup.nearDupAgainst(probe, corpus, "text", "doc_id",
        jaccardThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((2L, 1L)), s"got $hits")
    // overlapping ids never self-pair
    val self = Dedup.nearDupAgainst(docs, docs, "text", "doc_id",
        jaccardThreshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(self.forall { case (a, b) => a != b })
    // empty probe and empty corpus both yield empty, not an error
    val none = docs.where(lit(false))
    assert(Dedup.nearDupAgainst(none, corpus, "text", "doc_id").count() == 0)
    assert(Dedup.nearDupAgainst(probe, none, "text", "doc_id").count() == 0)
  }

  test("decontamination flags exact n-gram leakage, not mere similarity") {
    val benchmark = Seq(
      (100L, "what is the capital city of france paris is the answer")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // leaked: contains a verbatim benchmark 5-gram inside unique text
      (1L, "some training document asks what is the capital city of france among other things"),
      // topically similar but no shared 5-gram
      (2L, "paris france capital questions appear often in geography quizzes"),
      (3L, "entirely unrelated text about spark shuffle partitions")
    ).toDF("doc_id", "text")
    val hits = Dedup.contaminatedDocs(corpus, benchmark, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L) && hits(1L) >= 1, s"got $hits")
    assert(!hits.contains(2L) && !hits.contains(3L), s"got $hits")
    val clean = Dedup.decontaminate(corpus, benchmark, "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(clean.toSeq == Seq(2L, 3L))
  }

  test("connectedComponents: min-member labels on both the driver and distributed paths") {
    // two components (a 9-node path — worst case for plain propagation,
    // exercising path compression — and a triangle) plus ids that are
    // NOT contiguous, so labels can't accidentally equal positions
    val chain = (0 until 8).map(i => (10L + i, 11L + i)) // path 10..18
    val tri = Seq((100L, 104L), (104L, 102L), (102L, 100L))
    val pairs = (chain ++ tri).toDF("id_a", "id_b")
    for (cap <- Seq(Long.MaxValue, 0L)) { // driver union-find / distributed loop
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b",
        maxIter = 6, maxDriverEdges = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((10L to 18L).forall(comp(_) == 10L), s"cap=$cap chain mislabeled: $comp")
      assert(Seq(100L, 102L, 104L).forall(comp(_) == 100L), s"cap=$cap triangle: $comp")
      assert(comp.size == 12)
    }
    // the per-call rounds diagnostic: 0 on the driver path (not
    // iterative); ≥ 2 on the forced distributed path for a 9-hop chain
    // (log-diameter with per-round compression)
    val (_, r0) = Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b",
      maxIter = 6, maxDriverEdges = Long.MaxValue)
    assert(r0 == 0)
    val (_, rD) = Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b",
      maxIter = 6, maxDriverEdges = 0L)
    assert(rD >= 2 && rD <= 6, s"unexpected distributed round count $rD")
  }

  test("connectedComponents: driver and distributed paths agree on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 30
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("id_a", "id_b")
      val exact = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(pairs, "id_a", "id_b", maxDriverEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(exact == dist, s"trial $trial diverged")
    }
  }

  test("family semantics: transitive edit-chain collapses where pairwise keeps ends") {
    // A~B and B~C near-dup (successive single-word edits, word-bigram
    // J ≈ 0.81 each) but A vs C differ by two words (J ≈ 0.65 < 0.8):
    // the pair list has NO (A,C) edge, yet family semantics put all
    // three in one component — the case pairwise loser-removal gets
    // wrong (it keeps both A and C)
    val base = ('a' to 't').map(c => s"$c${c}word").mkString(" ") // 20 distinct words
    val editB = base.replace("eeword", "eXword")
    val editC = editB.replace("jjword", "jXword")
    val docs = Seq((1L, base), (2L, editB), (3L, editC), (9L, "wholly unrelated text"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 2, jaccardThreshold = 0.8)
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (2L, 3L)), s"fixture drifted: $edges")
    val family = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(family == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusterDedup keeps one representative per exact-duplicate family") {
    val docs = Seq(
      (5L, "identical family text shared across documents"),
      (2L, "identical family text shared across documents"),
      (8L, "identical family text shared across documents"),
      (3L, "a singleton document that stays")).toDF("doc_id", "text")
    val kept = Dedup.clusterDedup(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L), s"got $kept")
  }

  test("clusterDedupBy: highest-rank member survives; ties and nulls fall back to min id") {
    val docs = Seq(
      (5L, "identical family text shared across documents", 10L),
      (2L, "identical family text shared across documents", 30L),
      (8L, "identical family text shared across documents", 30L),
      (3L, "a singleton document that stays", 1L)).toDF("doc_id", "text", "n")
    // rank 30 tie between 2 and 8 → min id 2 wins; singleton untouched
    val kept = Dedup.clusterDedupBy(docs, "text", "doc_id", "n")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L), s"got $kept")
    // a strictly larger rank beats a smaller id
    val docs2 = docs.withColumn("n",
      when(col("doc_id") === 8L, 99L).otherwise(col("n")))
    val kept2 = Dedup.clusterDedupBy(docs2, "text", "doc_id", "n")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept2 == Seq(3L, 8L), s"got $kept2")
    // null ranks lose to any non-null; all-null family → min id
    val docs3 = docs.withColumn("n",
      when(col("doc_id") === 2L, lit(null).cast("long")).otherwise(col("n")))
    val kept3 = Dedup.clusterDedupBy(docs3, "text", "doc_id", "n")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept3 == Seq(3L, 8L), s"got $kept3") // 8 ranks 30, 5 ranks 10, 2 null
    val docs4 = docs.withColumn("n", lit(null).cast("long"))
    val kept4 = Dedup.clusterDedupBy(docs4, "text", "doc_id", "n")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept4 == Seq(2L, 3L), s"got $kept4")
    // partitioning invariance (the aggregate replaces a window)
    val kept5 = Dedup.clusterDedupBy(docs2.repartition(7), "text", "doc_id", "n")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept5 == kept2)
  }

  test("contaminationReport: per-doc gram and eval-doc counts; clean docs omitted") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),        // hits eval 100 (grams a..e, b..f? see below)
      (2L, "alpha beta gamma delta epsilon eta"),         // hits eval 100 on one gram
      (3L, "totally unrelated text with no overlap")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta"),
      (200L, "alpha beta gamma delta epsilon something else")).toDF("doc_id", "text")
    val rep = Dedup.contaminationReport(corpus, eval, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // doc 1 grams: [a b g d e], [b g d e z]; first hits BOTH eval docs,
    // second hits eval 100 only
    assert(rep(1L) == (2L, 2L), s"got ${rep.get(1L)}")
    // doc 2 grams: [a b g d e] (both evals), [b g d e eta] (neither —
    // eval 100's 5-grams are [a b g d e],[b g d e z],[g d e z eta])
    assert(rep(2L) == (1L, 2L), s"got ${rep.get(2L)}")
    assert(!rep.contains(3L), "clean docs must be omitted")
    // consistency with the drop path: flagged ids == contaminatedDocs ids
    val flagged = Dedup.contaminatedDocs(corpus, eval, "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep.keySet == flagged)
  }

  test("evalContamination: per-eval-item fraction, >= boundary, null text excluded") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated text with no overlap")).toDF("doc_id", "text")
    val eval = Seq(
      // grams [a b g d e], [b g d e z] — both in corpus doc 1 → 2/2
      (100L, "alpha beta gamma delta epsilon zeta"),
      // grams [a b g d e] (hit), [b g d e other] (miss) → 1/2, below 7/10
      (200L, "alpha beta gamma delta epsilon other"),
      // no gram in the corpus → 0/2
      (300L, "six distinct words never seen anywhere"),
      (400L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.evalContamination(corpus, eval, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out(100L) == (2L, 2L, 1), s"got ${out.get(100L)}")
    assert(out(200L) == (2L, 1L, 0), s"got ${out.get(200L)}")
    assert(out(300L) == (2L, 0L, 0), s"got ${out.get(300L)}")
    assert(!out.contains(400L), "null-text eval docs carry no grams")
    // the >= boundary: 1/2 matched at threshold 1/2 IS contaminated
    val half = Dedup.evalContamination(corpus, eval, "text", "doc_id", n = 5,
      minFracNum = 1, minFracDen = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(half(200L) == 1, "exact-fraction boundary must flag (>=)")
    // partitioning invariance
    val out2 = Dedup.evalContamination(corpus.repartition(5), eval.repartition(3),
      "text", "doc_id", n = 5).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out2 == out)
    // threshold validation fails loud
    intercept[IllegalArgumentException] {
      Dedup.evalContamination(corpus, eval, "text", "doc_id", minFracNum = 3,
        minFracDen = 2)
    }
  }

  test("determinism: same pairs regardless of partitioning") {
    val p1 = Dedup.minHashLshPairs(docs.repartition(7), "text", "doc_id", jaccardThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = Dedup.minHashLshPairs(docs.coalesce(1), "text", "doc_id", jaccardThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == p2)
  }

  test("bloom decontamination: superset of exact flags, equal on this corpus, parallelism-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val eval = docs.where(col("doc_id") % 31 === 0)
    val corpus = docs.where(col("doc_id") % 31 =!= 0)
    def hits(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = hits(Dedup.contaminatedDocs(corpus, eval, "text", "doc_id", n = 5))
    // default fpp=1e-3 over ~20k probed grams WILL produce ~20
    // deterministic false positives on this fixture — assert only the
    // containment contract for it
    val loose = hits(Dedup.contaminatedDocsBloom(corpus, eval, "text", "doc_id", n = 5))
    exact.foreach { case (id, n) =>
      assert(loose.contains(id) && loose(id) >= n, s"doc $id: exact $n, bloom ${loose.get(id)}")
    }
    // at fpp=1e-8 (expected FPs ~2e-4) the filter reproduces the exact
    // pass bit-for-bit on this fixture
    val tight = hits(Dedup.contaminatedDocsBloom(corpus, eval, "text", "doc_id",
      n = 5, fpp = 1e-8))
    assert(tight == exact)
    // bit-OR aggregation is layout-invariant
    val tight1 = hits(Dedup.contaminatedDocsBloom(
      corpus.repartition(13), eval.coalesce(1), "text", "doc_id", n = 5, fpp = 1e-8))
    assert(tight1 == tight)
  }

  test("duplicateSpanScrub cuts repeated passages, keeps the first occurrence") {
    // doc 1 and doc 2 share an 8-token boilerplate block at DIFFERENT
    // offsets; doc 3 is unrelated; doc 4 is shorter than the gram width
    val boiler = "all rights reserved no part may be reproduced"
    val corpus = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon"),
      (2L, s"zeta eta theta $boiler"),
      (3L, "a completely unrelated document about stream processing watermarks"),
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanScrub(corpus, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // doc 1 holds the canonical (globally-first) occurrence: untouched
    assert(out(1L) == (s"$boiler alpha beta gamma delta epsilon", 0), s"got ${out(1L)}")
    // doc 2's copy is scrubbed; its unique prefix survives
    assert(out(2L) == ("zeta eta theta", 8), s"got ${out(2L)}")
    // unrelated + sub-gram-width docs pass through (normalized join)
    assert(out(3L)._2 == 0 && out(4L) == ("tiny doc", 0))
  }

  test("duplicateSpanScrub: a doc that is entirely duplicated text disappears") {
    val block = "one two three four five six seven eight"
    val corpus = Seq(
      (10L, s"$block and then some trailing original content here"),
      (20L, block)
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanScrub(corpus, "text", "doc_id", n = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(10L), s"doc 20 should vanish, got $out")
  }

  test("duplicateSpanScrub: within-doc repetition scrubs the later copy") {
    val chant = "badger badger badger badger mushroom mushroom snake snake"
    val corpus = Seq(
      (1L, s"$chant some middle words appear right here $chant"),
      (2L, "entirely different filler content with no repeats at all")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanScrub(corpus, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == (s"$chant some middle words appear right here", 8), s"got ${out(1L)}")
  }

  test("duplicateSpanScrubAgainst: frozen-corpus passages cut, probe-internal repeats kept; bloom == exact") {
    val boiler = "all rights reserved no part may be reproduced"
    val corpus = Seq(
      (100L, s"corpus context one $boiler corpus context two"),
      (101L, "unrelated frozen corpus content sits here")).toDF("doc_id", "text")
    val chant = "alpha beta gamma delta epsilon zeta eta theta"
    val probe = Seq(
      (1L, s"fresh words then $boiler and a fresh tail"),
      (2L, s"$chant middle unique words right here $chant"),
      (3L, "entirely novel probe content with no duplicates")).toDF("doc_id", "text")
    def run(fpp: Double) =
      Dedup.duplicateSpanScrubAgainst(probe, corpus, "text", "doc_id", n = 8, bloomFpp = fpp)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val out = run(0.0)
    // corpus passage cut from doc 1; its unique frame survives
    assert(out(1L) == ("fresh words then and a fresh tail", 8), s"got ${out(1L)}")
    // probe-INTERNAL duplication untouched (the full pass's job, not this one's)
    assert(out(2L)._2 == 0)
    assert(out(3L)._2 == 0)
    // map-side Bloom screen reproduces the exact path at tight fpp
    assert(run(1e-8) == out)
  }

  test("duplicateSpanScrub determinism across partitionings") {
    val corpus = docs.union(docs.withColumn("doc_id", col("doc_id") + 100))
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.duplicateSpanScrub(df, "text", "doc_id", n = 8)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(run(corpus.repartition(7)) == run(corpus.coalesce(1)))
  }

  test("LshIndex: probe == nearDupAgainst bit-identically on the gate corpus") {
    import graft.operators.LshIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = pairs(Dedup.nearDupAgainst(probe, corpus, "text", "doc_id"))
    assert(direct.nonEmpty, "fixture must contain cross-split near-dups")
    val idx = LshIndex.build(corpus, "text", "doc_id")
    assert(pairs(idx.probe(probe, "text", "doc_id")) == direct)
  }

  test("LshIndex.append(A,B) == build(A∪B): identical frames, identical probe") {
    import graft.operators.LshIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val a = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val b = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val appended = LshIndex.build(a, "text", "doc_id").append(b, "text")
    val rebuilt = LshIndex.build(corpus, "text", "doc_id")
    // the index CONTENTS agree row-for-row, not just the probe answers
    assert(appended.bands.collect().toSet == rebuilt.bands.collect().toSet)
    assert(appended.shingles.collect().map(r =>
        (r.getLong(0), r.getSeq[Long](1))).toSet ==
      rebuilt.shingles.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(appended.probe(probe, "text", "doc_id")) ==
      pairs(Dedup.nearDupAgainst(probe, corpus, "text", "doc_id")))
  }

  test("LshIndex.remove(build(A∪B), ids(B)) == build(A): frames, probe, and no removed ids") {
    import graft.operators.LshIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val keepSide = corpus.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val dropSide = corpus.where(pmod(col("doc_id"), lit(5)) === 0)
    val removed = LshIndex.build(corpus, "text", "doc_id")
      .remove(dropSide.select("doc_id"))
    val rebuilt = LshIndex.build(keepSide, "text", "doc_id")
    assert(removed.bands.collect().toSet == rebuilt.bands.collect().toSet)
    assert(removed.shingles.collect().map(r =>
        (r.getLong(0), r.getSeq[Long](1))).toSet ==
      rebuilt.shingles.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val p = pairs(removed.probe(probe, "text", "doc_id"))
    assert(p == pairs(Dedup.nearDupAgainst(probe, keepSide, "text", "doc_id")))
    assert(p.forall(_._2 % 5 != 0), "a removed id surfaced from the index")
    // removing unknown ids is a no-op
    val spark2 = d.sparkSession
    import spark2.implicits._
    val noop = LshIndex.build(corpus, "text", "doc_id")
      .remove(Seq(999999L).toDF("doc_id"))
    assert(noop.bands.count() == LshIndex.build(corpus, "text", "doc_id").bands.count())
  }

  test("LshIndex.loadBands: restricted probe is a verified subset; partitions prune") {
    import graft.operators.LshIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("lshidx_bands").toString
    LshIndex.build(corpus, "text", "doc_id").save(dir)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(LshIndex.load(spark, dir).probe(probe, "text", "doc_id"))
    assert(full.nonEmpty)
    // every band == the full index
    assert(pairs(LshIndex.loadBands(spark, dir, 0 until 16)
      .probe(probe, "text", "doc_id")) == full)
    // k of n bands: survivors are exact-verified, so a SUBSET — band
    // restriction can lose pairs, never admit false ones
    val sub = pairs(LshIndex.loadBands(spark, dir, Seq(0, 1, 2, 3))
      .probe(probe, "text", "doc_id"))
    assert(sub.subsetOf(full), "restricted probe admitted a pair the full probe lacks")
    // the restriction reaches the parquet scan as a partition filter
    val plan = LshIndex.loadBands(spark, dir, Seq(0, 1, 2, 3))
      .bands.queryExecution.executedPlan.toString()
    val pf = "PartitionFilters: \\[[^\\]]*band[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"band restriction not pushed to partition pruning:\n${plan.take(1200)}")
    intercept[IllegalArgumentException] {
      LshIndex.loadBands(spark, dir, Seq(16))
    }
  }

  test("LshIndex save → load → probe round-trip preserves banding geometry") {
    import graft.operators.LshIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val idx = LshIndex.build(corpus, "text", "doc_id",
      shingleK = 5, bands = 16, rowsPerBand = 8)
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    idx.save(dir)
    val re = LshIndex.load(spark, dir)
    assert((re.shingleK, re.nBands, re.rowsPerBand, re.idCol) == (5, 16, 8, "doc_id"))
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(re.probe(probe, "text", "doc_id")) ==
      pairs(Dedup.nearDupAgainst(probe, corpus, "text", "doc_id")))
  }

  test("SpanIndex: scrub == duplicateSpanScrubAgainst bit-identically (exact + Bloom)") {
    import graft.operators.SpanIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    val idx = SpanIndex.build(corpus, "text", n = 8)
    val adHoc = rows(Dedup.duplicateSpanScrubAgainst(probe, corpus, "text", "doc_id", n = 8))
    assert(rows(idx.scrub(probe, "text", "doc_id")) == adHoc)
    // Bloom path: at fpp 1e-8 the expected false-positive count on this
    // corpus is ~1e-4, so index-Bloom == exact (same law the ad-hoc
    // Bloom branch is pinned by)
    assert(rows(idx.scrub(probe, "text", "doc_id", bloomFpp = 1e-8)) == adHoc)
  }

  test("SpanIndex.append(A,B) == build(A∪B): identical gram FRAMES, identical scrub") {
    import graft.operators.SpanIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val a = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val b = corpus.where(pmod(col("doc_id"), lit(2)) =!= 0)
    val appended = SpanIndex.build(a, "text", n = 8).append(b, "text")
    val rebuilt = SpanIndex.build(corpus, "text", n = 8)
    // grams carry no doc ids, so the law is EXACT frame equality
    // (distinct-of-union == union-of-distincts), not just probe parity —
    // and no id-disjointness contract is needed (a and b overlap freely)
    def grams(ix: SpanIndex.SpanIndex) =
      ix.grams.collect().map(_.getLong(0)).toSet
    assert(grams(appended) == grams(rebuilt))
    assert(appended.n == rebuilt.n)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(rows(appended.scrub(probe, "text", "doc_id")) ==
      rows(rebuilt.scrub(probe, "text", "doc_id")))
  }

  test("SpanIndex save → load → scrub round-trip; mutated meta fails loudly") {
    import graft.operators.SpanIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val idx = SpanIndex.build(corpus, "text", n = 8)
    val dir = java.nio.file.Files.createTempDirectory("spanidx").toString
    idx.save(dir)
    val re = SpanIndex.load(spark, dir)
    assert(re.n == 8)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(rows(re.scrub(probe, "text", "doc_id")) ==
      rows(Dedup.duplicateSpanScrubAgainst(probe, corpus, "text", "doc_id", n = 8)))
    // meta mutation: a schema evolution that renames/drops span_n must
    // fail at load naming the field (not read a stale ordinal)
    import spark.implicits._
    Seq(8).toDF("renamed_n").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] { SpanIndex.load(spark, dir) }
    assert(e.getMessage.contains("span_n"))
  }

  test("SpanIndex persisted Bloom: save(fpp) -> load serves the filter aggregate-free and scrubs identically") {
    import graft.operators.SpanIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val idx = SpanIndex.build(corpus, "text", n = 8)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    val exact = rows(idx.scrub(probe, "text", "doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("spanidx_bloom").toString
    idx.save(dir, bloomFpp = 1e-8)
    val re = SpanIndex.load(spark, dir)
    // the filter rides the index: Bloom scrubs serve from the SAVED
    // bytes (no per-session aggregate), and at fpp 1e-8 the result
    // equals the exact join (same law the ad-hoc Bloom branch is
    // pinned by)
    assert(re.bloom.exists(_._1 == 1e-8))
    assert(rows(re.scrub(probe, "text", "doc_id", bloomFpp = 1e-3)) == exact)
    // a bloomless save loads with no filter and still Bloom-scrubs by
    // building the filter per session
    val dir2 = java.nio.file.Files.createTempDirectory("spanidx_nobloom").toString
    idx.save(dir2)
    val re2 = SpanIndex.load(spark, dir2)
    assert(re2.bloom.isEmpty)
    assert(rows(re2.scrub(probe, "text", "doc_id", bloomFpp = 1e-8)) == exact)
    // append drops the carried filter (it describes the old gram set)
    assert(re.append(probe, "text").bloom.isEmpty)
    // a meta recording a filter whose bytes are gone must fail loudly
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/bloom"), true)
    val e = intercept[IllegalArgumentException] { SpanIndex.load(spark, dir) }
    assert(e.getMessage.contains("bloom"))
  }

  test("EvalIndex: contaminated/decontaminate == the ad-hoc operators bit-identically (exact + Bloom)") {
    import graft.operators.EvalIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = d.where(pmod(col("doc_id"), lit(31)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
    def flags(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"))).toSet
    val idx = EvalIndex.build(bench, "text", n = 5)
    val adHoc = flags(Dedup.contaminatedDocs(corpus, bench, "text", "doc_id", n = 5))
    assert(flags(idx.contaminated(corpus, "text", "doc_id")) == adHoc)
    // Bloom path at fpp 1e-8: expected FP count ~1e-4 on this gram set,
    // so index-Bloom == exact (the q_decontaminate_bloom law)
    assert(flags(idx.contaminated(corpus, "text", "doc_id", bloomFpp = 1e-8)) == adHoc)
    // the survivor side too
    def ids(df: DataFrame) = df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(idx.decontaminate(corpus, "text", "doc_id")) ==
      ids(Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 5)))
    // at a COARSE fpp the Bloom flags are a superset (never under-flag)
    val coarse = flags(idx.contaminated(corpus, "text", "doc_id", bloomFpp = 0.2))
    assert(adHoc.map(_._1).subsetOf(coarse.map(_._1)))
  }

  test("EvalIndex.append(A,B) == build(A∪B): identical gram FRAMES; save → load round-trip; mutated meta fails loudly") {
    import graft.operators.EvalIndex
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = d.where(pmod(col("doc_id"), lit(31)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val a = bench.where(pmod(col("doc_id"), lit(2)) === 0)
    val b = bench.where(pmod(col("doc_id"), lit(2)) =!= 0)
    // grams carry no doc ids: the law is EXACT frame equality
    // (distinct-of-union == union-of-distincts), no id contract
    def grams(ix: EvalIndex.EvalIndex) =
      ix.grams.collect().map(_.getString(0)).toSet
    val appended = EvalIndex.build(a, "text", n = 5).append(b, "text")
    val rebuilt = EvalIndex.build(bench, "text", n = 5)
    assert(grams(appended) == grams(rebuilt))
    assert(appended.n == rebuilt.n)
    // round-trip: save → load flags identically; the persisted Bloom
    // serves aggregate-free and equals exact at fpp 1e-8
    def flags(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"))).toSet
    val exact = flags(rebuilt.contaminated(corpus, "text", "doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("evalidx").toString
    rebuilt.save(dir, bloomFpp = 1e-8)
    val re = EvalIndex.load(spark, dir)
    assert(re.n == 5)
    assert(re.bloom.exists(_._1 == 1e-8))
    assert(flags(re.contaminated(corpus, "text", "doc_id")) == exact)
    assert(flags(re.contaminated(corpus, "text", "doc_id", bloomFpp = 1e-3)) == exact)
    // append drops the carried filter (it describes the old gram set)
    assert(re.append(b, "text").bloom.isEmpty)
    // meta mutation fails at load naming the field
    import spark.implicits._
    Seq(5).toDF("renamed_n").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] { EvalIndex.load(spark, dir) }
    assert(e.getMessage.contains("decontam_n"))
  }

  test("LshIndex.load: a mutated meta fails loudly, naming the missing field") {
    import graft.operators.LshIndex
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001").limit(32)
    val dir = java.nio.file.Files.createTempDirectory("lshidxmut").toString
    LshIndex.build(corpus, "text", "doc_id").save(dir)
    // simulate a schema evolution / corruption: rewrite meta without n_bands
    import spark.implicits._
    Seq((5, 8, "doc_id")).toDF("shingle_k", "rows_per_band", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] { LshIndex.load(spark, dir) }
    assert(e.getMessage.contains("n_bands"))
    assert(e.getMessage.contains("meta"))
  }

  test("lshGeometry: closest S-curve midpoint under the hash budget, recall-leaning ties") {
    val (b, r) = Dedup.lshGeometry(0.8, 128)
    assert(b * r <= 128 && b >= 1 && r >= 1)
    // minimality: no other (floor-budget) banding lands closer
    val all = (1 to 128).map(rr => (128 / rr, rr)).filter(_._1 >= 1)
    val d0 = math.abs(Dedup.lshThreshold(b, r) - 0.8)
    assert(all.forall { case (bb, rr) =>
      math.abs(Dedup.lshThreshold(bb, rr) - 0.8) >= d0 - 1e-12 })
    // ties prefer MORE bands: any equally-close banding has bands <= b
    assert(all.forall { case (bb, rr) =>
      math.abs(Dedup.lshThreshold(bb, rr) - 0.8) > d0 + 1e-12 || bb <= b })
    // the shipped 16x8 default documents its ~0.707 midpoint
    assert(math.abs(Dedup.lshThreshold(16, 8) - math.pow(1.0 / 16, 1.0 / 8)) == 0.0)
    assert(math.abs(Dedup.lshThreshold(16, 8) - 0.707) < 0.01)
    // monotone in the target
    val lo = (Dedup.lshGeometry(0.4, 128) match { case (bb, rr) => Dedup.lshThreshold(bb, rr) })
    val hi = (Dedup.lshGeometry(0.9, 128) match { case (bb, rr) => Dedup.lshThreshold(bb, rr) })
    assert(lo < hi)
    intercept[IllegalArgumentException] { Dedup.lshGeometry(0.0) }
    intercept[IllegalArgumentException] { Dedup.lshGeometry(0.5, 1) }
  }

  test("spanDuplicationStats: per-group removed-token shares, fully-scrubbed and zero-token docs") {
    import spark.implicits._
    val ten = "a b c d e f g h i j"          // 10 tokens, 3 windows of 8
    val uniq = "k l m n o p q r s t"         // 10 unique tokens
    val df = Seq(
      (1L, "g1", uniq),                       // nothing duplicated
      (2L, "g1", "!!! ???"),                  // zero tokens after normalize
      (3L, "g2", ten),                        // canonical first occurrence
      (4L, "g2", ten),                        // exact copy: fully scrubbed
      (5L, "g2", null.asInstanceOf[String])   // null text: not counted
    ).toDF("doc_id", "grp", "text")
    val out = Dedup.spanDuplicationStats(df, "text", "doc_id", "grp")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("g1") == ((2L, 10L, 0L, 0.0)))
    // g2: 20 tokens, doc 4's 10 all removed -> share 0.5
    assert(out("g2") == ((2L, 20L, 10L, 0.5)))
  }

  test("nearDupAgainstTuned == nearDupAgainst with lshGeometry's banding; catches pairs 16x8 misses at low thresholds") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = docs.where(col("doc_id") % 7 === 0)
    val corpus = docs.where(col("doc_id") % 7 =!= 0)
    val (b, r) = Dedup.lshGeometry(0.6, 128)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "corpus_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val tuned = pairs(Dedup.nearDupAgainstTuned(probe, corpus, "text", "doc_id",
      jaccardThreshold = 0.6))
    val explicit = pairs(Dedup.nearDupAgainst(probe, corpus, "text", "doc_id",
      bands = b, rowsPerBand = r, jaccardThreshold = 0.6))
    assert(tuned == explicit)
    // at threshold 0.6 the tuned geometry's recall can only be >= the
    // mismatched default 16x8 (candidates are exact-verified, so sets
    // are comparable)
    val mismatched = pairs(Dedup.nearDupAgainst(probe, corpus, "text", "doc_id",
      jaccardThreshold = 0.6))
    assert(mismatched.subsetOf(tuned) || tuned.size >= mismatched.size)
  }

  test("noveltyScore: stamped-out copies score 0, unique prose scores 1, mixtures between") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact stamp-out of 1
      (3L, "totally different words about rivers and mountains here"),
      (4L, "alpha beta gamma plus totally different words trailing")
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0) // every gram shared
    assert(out(3L) > 0.8, s"unique doc ${out(3L)}")
    assert(out(4L) > 0.0 && out(4L) < 1.0)
    // short doc (< n tokens): its whole stream is one gram
    val short = Dedup.noveltyScore(
      Seq((1L, "one two"), (2L, "one two")).toDF("doc_id", "text"),
      "text", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(short.forall { case (_, g, nv) => g == 1 && nv == 0.0 })
  }

  /** The reference brute force for the containment operators: replicate
    * normalizeText → tokens → distinct word 3-grams in plain Scala and
    * compute every ordered pair's |A∩B|/|A| with no filtering at all. */
  private def bruteContainment(docs: Seq[(Long, String)],
      tauBp: Int): Set[(Long, Long)] = {
    def gramSet(t: String): Set[String] = {
      val toks = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> gramSet(t) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      if (sa & sb).size.toLong * 10000 >= tauBp.toLong * sa.size
    } yield (ia, ib)).toSet
  }

  test("containmentPairs: catches a snippet symmetric Jaccard is blind to, asymmetrically") {
    val big = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray " +
      "yankee zulu one two three four five six seven eight nine ten"
    val snippet = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val docs = Seq((1L, big), (2L, snippet),
      (3L, "completely unrelated text about storage engines and page caches today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id", n = 3, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // snippet ⊂ big fires in exactly ONE direction with containment 1.0
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((2L, 1L)), pairs.mkString(","))
    assert(pairs.head._3 == 1.0)
    // and the same pair's symmetric Jaccard sits far below any dedup cut
    def grams(t: String): Set[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq.sliding(3).map(_.mkString(" ")).toSet
    val (ga, gb) = (grams(snippet), grams(big))
    val j = (ga & gb).size.toDouble / (ga | gb).size
    assert(j < 0.4, s"jaccard $j not snippet-shaped")
  }

  test("containmentPairs: prefix filtering is lossless against brute force") {
    // seeded small-vocab corpus: heavy gram collisions, varied lengths —
    // the regime where a lossy candidate scheme would actually drop pairs
    val rnd = new scala.util.Random(7)
    val vocab = Vector("data", "spark", "shuffle", "join", "scan", "sort",
      "cache", "page", "row", "key")
    val docs = (1L to 40L).map { id =>
      val w = 3 + rnd.nextInt(25)
      id -> Seq.fill(w)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (tau <- Seq(0.5, 0.8, 1.0)) {
      val tauBp = math.round(tau * 10000).toInt
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", n = 3, tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteContainment(docs, tauBp)
      assert(got == want,
        s"tau=$tau: missing=${want -- got} spurious=${got -- want}")
    }
  }

  test("containedAgainst: probe-vs-corpus screen is lossless, corpus-absent grams rank rarest") {
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"),
      (2L, "storage engines flush memtables into sorted runs and compact them nightly"),
      (3L, "completely different text about page caches and prefetch distance tuning"))
      .toDF("doc_id", "text")
    val probe = Seq(
      // fully contained in corpus doc 1
      (101L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      // grams absent from the corpus entirely (the rarest-prefix edge:
      // df 0 on every gram) — must emit nothing, not crash
      (102L, "zebra yak xylophone wombat vole urchin tapir"),
      // half-contained in doc 2: below tau
      (103L, "storage engines flush memtables into unrelated words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.containedAgainst(probe, corpus, "text", "doc_id", n = 3, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.map(p => (p._1, p._2)).toSet == Set((101L, 1L)), got.mkString(","))
    assert(got.head._3 == 1.0)
    // brute-force parity at a lower tau where 103 fires too
    val lo = Dedup.containedAgainst(probe, corpus, "text", "doc_id", n = 3, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def gramSet(t: String): Set[String] = {
      val toks = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val cs = Seq(1L, 2L, 3L).zip(corpus.collect().sortBy(_.getLong(0)).map(r => gramSet(r.getString(1))))
    val ps = Seq(101L, 102L, 103L).zip(probe.collect().sortBy(_.getLong(0)).map(r => gramSet(r.getString(1))))
    val want = (for {
      (pi, pg) <- ps; (ci, cg) <- cs
      if (pg & cg).size.toLong * 10000 >= 4000L * pg.size
    } yield (pi, ci)).toSet
    assert(lo == want, s"missing=${want -- lo} spurious=${lo -- want}")
  }

  test("winnowNearDupPairs: substring floor fires at low coverage, ratio gate separates true dups") {
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, shared + " and then walks home counting fence posts along the road"),
      (2L, "yesterday evening " + shared + " again surprising every onlooker nearby"),
      (3L, "storage engines flush memtables into sorted runs and compact them nightly"),
      (4L, shared + " and then walks home counting fence posts along the road"))
      .toDF("doc_id", "text")
    // low coverage cut: the embedded shared run is enough — the
    // winnowing guarantee (any common run ≥ w + k − 1 chars shares a
    // fingerprint) makes the pair visible despite different tails
    val lo = Dedup.winnowNearDupPairs(docs, "text", "doc_id",
      k = 5, w = 4, minShared = 5, minCoverage = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(lo.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      lo.mkString(","))
    assert(lo.forall(_._3 >= 10), lo.mkString(","))
    // the gate's 0.9 coverage cut keeps only the exact dup (1,4): the
    // shared-run pairs have real unique tails on both sides
    val hi = Dedup.winnowNearDupPairs(docs, "text", "doc_id",
      k = 5, w = 4, minShared = 5, minCoverage = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(hi.map(p => (p._1, p._2)).toSet == Set((1L, 4L)), hi.mkString(","))
    assert(hi.head._3 == 1.0)
  }

  test("winnowNearDupPairsBanded == exact form on both gate fixtures") {
    // the scale form's recall argument made concrete: at the gate's 0.9
    // coverage the surviving pairs sit at J ≈ 1 (measured: every gate
    // survivor holds coverage 1.0), where 16×8 banding recall is
    // 1 − (1 − J⁸)¹⁶ ≈ 1 − 1e-12 — so banded output EQUALS exact here
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val docs = Tables.documents(spark, dir)
      def pairs(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
      val exact = pairs(Dedup.winnowNearDupPairs(docs, "text", "doc_id",
        k = 5, w = 4, minShared = 5, minCoverage = 0.9))
      val banded = pairs(Dedup.winnowNearDupPairsBanded(docs, "text", "doc_id",
        k = 5, w = 4, minShared = 5, minCoverage = 0.9))
      assert(exact.nonEmpty, s"$dir: fixture must have winnow pairs")
      assert(banded == exact,
        s"$dir: missed=${(exact -- banded).take(5)} spurious=${(banded -- exact).take(5)}")
    }
  }

  test("containmentScrub: bigger container survives, ties keep the smaller id, chains drop both") {
    val c = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    val b = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa"
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq((10L, a), (20L, b), (30L, c), (40L, c),
      (50L, "unrelated content about compaction levels and bloom filter bits today"))
      .toDF("doc_id", "text")
    val kept = Dedup.containmentScrub(docs, "text", "doc_id", n = 3, tau = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // chain a ⊂ b ⊂ c drops 10 and 20; exact dups 30/40 tie → keep 30;
    // 50 untouched
    assert(kept == Set(30L, 50L), kept.toSeq.sorted.mkString(","))
  }
}
