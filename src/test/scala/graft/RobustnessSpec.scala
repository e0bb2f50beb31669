package graft

import org.apache.spark.sql.functions._
import graft.stats.{DESeq2Unpaired, EdgeRUnpaired, NOISeq, Vst}

/** Pathological-input robustness: all-zero genes, constant genes, and a
  * zero-heavy column must flow through the differential operators with
  * finite, in-range statistics (no ANSI arithmetic throws, no NaN/Inf in
  * p-values). */
class RobustnessSpec extends SparkSpec {

  import spark.implicits._

  def uglyDf = Seq(
    ("zeroGene", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ("constGene", 5.0, 5.0, 5.0, 5.0, 5.0, 5.0),
    ("normalA", 30.0, 25.0, 28.0, 5.0, 6.0, 4.0),
    ("normalB", 3.0, 4.0, 5.0, 40.0, 45.0, 38.0),
    ("sparse", 0.0, 1.0, 0.0, 2.0, 0.0, 0.0)
  ).toDF("gene_stable_id", "a1", "a2", "a3", "b1", "b2", "b3")

  val condToCols = Map("A" -> Seq("a1", "a2", "a3"), "B" -> Seq("b1", "b2", "b3"))

  test("edgeR handles zero/constant/sparse genes") {
    val out = EdgeRUnpaired("A", "B", condToCols, index = "gene_stable_id")(uglyDf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.size == 5)
    out.foreach { case (g, (lfc, p, fdr)) =>
      assert(!lfc.isNaN && !lfc.isInfinite, s"$g lfc=$lfc")
      assert(p > 0 && p <= 1, s"$g p=$p")
      assert(fdr > 0 && fdr <= 1, s"$g fdr=$fdr")
    }
    assert(out("zeroGene")._2 == 1.0)
    assert(out("normalA")._2 < 0.05 && out("normalB")._2 < 0.05)
  }

  test("DESeq2 handles zero/constant/sparse genes") {
    val out = DESeq2Unpaired("A", "B", condToCols, index = "gene_stable_id")(uglyDf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { case (g, (lfc, p)) =>
      assert(!lfc.isNaN && !lfc.isInfinite, s"$g lfc=$lfc")
      assert(p >= 0 && p <= 1, s"$g p=$p")
    }
  }

  test("NOISeq handles zero/constant/sparse genes") {
    val out = NOISeq("A", "B", condToCols, index = "gene_stable_id")(uglyDf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    out.foreach { case (g, (m, prob)) =>
      assert(!m.isNaN && !m.isInfinite, s"$g M=$m")
      assert(prob >= 0 && prob <= 1, s"$g prob=$prob")
    }
  }

  test("NOISeqBIO handles zero/constant/sparse genes (degenerate buckets, tied thetas)") {
    // the bio branch adds bucket pooling, a0 percentiles and histogram
    // densities — all of which see degenerate inputs here: an all-zero
    // gene (k-replaced to constant), a constant gene (zero variance in
    // every relabeling), near-empty buckets (5 genes, 3 buckets)
    val out = NOISeq("A", "B", condToCols, index = "gene_stable_id",
      replicates = "biological", nclust = 3)(uglyDf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    assert(out.size == 5)
    out.foreach { case (g, (m, prob)) =>
      assert(!m.isNaN && !m.isInfinite, s"$g M=$m")
      assert(prob >= 0 && prob <= 1, s"$g prob=$prob")
    }
    // the genuinely differential genes must outrank the degenerate ones
    assert(out("normalA")._2 >= out("constGene")._2)
    assert(out("normalB")._2 >= out("zeroGene")._2)
  }

  test("kCenterSelect degenerate inputs: k > n, zero vectors, single row") {
    import graft.operators.Sampling
    val df = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    // k beyond the corpus: exact path keeps emitting argmax rows (the
    // greedy re-selects among what exists) — must not throw; zero-norm
    // vector rides the cosine-0 contract (distance 1 to everything)
    val out = Sampling.kCenterSelect(df, "embedding", "vec_id", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.length == 3 && out.map(_._2).distinct.length == 3)
    assert(out.head == ((0, 1L)))
    val one = Sampling.kCenterSelect(df.where(col("vec_id") === 2), "embedding",
      "vec_id", k = 1).collect()
    assert(one.length == 1 && one(0).getLong(1) == 2L)
    // sampled path on a tiny frame
    val s = Sampling.kCenterSelect(df, "embedding", "vec_id", k = 2, sampleCap = 2)
      .collect()
    assert(s.length == 2)
  }

  test("VST handles zero/constant/sparse genes") {
    val out = Vst(index = "gene_stable_id")(uglyDf).collect()
    out.foreach { r =>
      (1 to 6).foreach { i =>
        val v = r.getDouble(i)
        assert(!v.isNaN && !v.isInfinite, s"${r.getString(0)}[$i]=$v")
      }
    }
  }

  test("edgeR prior-df estimation survives degenerate genes in a larger frame") {
    // ≥20 informative genes engages the empirical prior.df fit; mix in
    // zero/constant/sparse genes so the deviance statistics see
    // pathological members (null stats must be filtered, not crash the
    // moment match)
    val rnd = new scala.util.Random(5)
    val rows = (0 until 60).map { i =>
      if (i % 10 == 0) (s"zero$i", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      else if (i % 10 == 1) (s"sparse$i", 0.0, 1.0, 0.0, 0.0, 2.0, 0.0)
      else {
        val base = math.exp(rnd.nextGaussian() + 3.0)
        def d() = math.max(0.0, math.round(base * math.exp(rnd.nextGaussian() * 0.3)).toDouble)
        (s"gene$i", d(), d(), d(), d(), d(), d())
      }
    }
    val df = rows.toDF("gene_stable_id", "a1", "a2", "a3", "b1", "b2", "b3")
    val out = EdgeRUnpaired("A", "B", condToCols, index = "gene_stable_id")(df)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.size == 60)
    out.foreach { case (g, (lfc, p)) =>
      assert(!lfc.isNaN && !lfc.isInfinite, s"$g lfc=$lfc")
      assert(p > 0 && p <= 1, s"$g p=$p")
    }
    // homogeneous same-mean groups: the estimated prior shrinks tagwise
    // dispersions toward the trend, so no gene should look significant
    val realPs = out.collect { case (g, (_, p)) if g.startsWith("gene") => p }
    assert(realPs.count(_ < 0.01) == 0, s"spurious significance: ${realPs.min}")
  }

  test("TMM survives an all-zero sample column") {
    val df = Seq(
      ("g1", 10.0, 0.0, 12.0),
      ("g2", 20.0, 0.0, 18.0),
      ("g3", 5.0, 0.0, 6.0)
    ).toDF("gene_stable_id", "s1", "s2", "s3")
    // zero library: factors must come back finite (neutral for the dead
    // column), not throw an ANSI division error
    val factors = graft.functions.Normalization.tmmFactors(df, Seq("s1", "s2", "s3"))
    assert(factors.values.forall(v => !v.isNaN && !v.isInfinite && v > 0), factors.toString)
  }

  test("AggloOp degenerate sizes: empty, singleton, n == k") {
    val empty = Seq.empty[(String, Double, Double)].toDF("gene_stable_id", "f1", "f2")
    val op0 = graft.operators.AggloOp(nClusters = 2, sort = false)
    assert(op0(empty).count() == 0)
    val one = Seq(("g1", 1.0, 2.0)).toDF("gene_stable_id", "f1", "f2")
    val op1 = graft.operators.AggloOp(nClusters = 2, sort = false)
    val r1 = op1(one).collect()
    assert(r1.length == 1 && r1(0).getAs[Int]("Agglo") == 0)
    assert(op1.lastLinkage.get.isEmpty)
    val three = Seq(("g1", 1.0, 2.0), ("g2", 9.0, 9.0), ("g3", 1.1, 2.1))
      .toDF("gene_stable_id", "f1", "f2")
    val op3 = graft.operators.AggloOp(nClusters = 3, sort = false)
    // n == k: every row its own cluster, linkage still n-1 rows
    assert(op3(three).select("Agglo").distinct().count() == 3)
    assert(op3.lastLinkage.get.length == 2)
  }

  test("embedding near-dup handles empty and single-row inputs on both paths") {
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.embeddingNearDupPairs(
      empty, "embedding", "vec_id", 0.5).count() == 0)
    val one = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.embeddingNearDupPairs(
      one, "embedding", "vec_id", 0.5).count() == 0)
    // forced-approximate on a tiny frame: quantizer must clamp nlist ≤ n
    assert(graft.operators.Similarity.embeddingNearDupPairs(
      Seq((1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.01)), (3L, Array(-1.0, 0.0)))
        .toDF("vec_id", "embedding"),
      "embedding", "vec_id", 0.5, approximate = Some(true)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test(".xls round-trips a header-only (zero-row) frame") {
    val hdr = Seq.empty[(String, Double)].toDF("gid", "score")
    val path = java.nio.file.Files.createTempDirectory("xls").resolve("hdr.xls").toString
    graft.sources.Biff.writeXls(path, Seq("data" -> hdr))
    val back = graft.sources.Excel.readXls(spark, path)
    assert(back.columns.toSeq == Seq("gid", "score") && back.count() == 0)
  }

  test("as-of join degenerate inputs: empty right, empty left") {
    val left = Seq((1L, 5L, "a")).toDF("k", "t", "lv")
    val emptyRight = Seq.empty[(Long, Long, String)].toDF("k", "t", "rv")
    val r1 = graft.operators.AsofJoin.backward(left, emptyRight, Seq("k"), "t")
      .collect()
    assert(r1.length == 1 && r1(0).isNullAt(3), "empty right → null payloads")
    val emptyLeft = Seq.empty[(Long, Long, String)].toDF("k", "t", "lv")
    assert(graft.operators.AsofJoin.backward(
      emptyLeft, Seq((1L, 3L, "b")).toDF("k", "t", "rv"), Seq("k"), "t").count() == 0)
  }

  test("quota sampling degenerate inputs: empty frame, quota above group sizes") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(graft.operators.Sampling.quotaPerGroup(empty, "source", "doc_id", 5).count() == 0)
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val all = graft.operators.Sampling.quotaPerGroup(tiny, "source", "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L), "quota above group size keeps everything")
  }

  test("curation screen on an empty batch (streaming empty-micro-batch shape)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val emptyBatch = docs.where(org.apache.spark.sql.functions.lit(false))
    assert(graft.streaming.CurationStream.screen(
      emptyBatch, docs, docs.limit(5)).count() == 0)
  }

  test("packing degenerate inputs: null text packs as 0 tokens, null id dropped") {
    val docs = Seq(
      (Option(1L), Option("three tokens here")),
      (Option(2L), Option.empty[String]),          // null text → ntok 0
      (Option.empty[Long], Option("orphan"))       // null id → dropped
    ).toDF("doc_id", "text")
    val out = graft.operators.Packing.packSequences(docs, "text", "doc_id",
      budgetTokens = 8, streams = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((0L, 0L, 3L)))
    assert(out(2L) == ((0L, 3L, 0L)), "null text occupies zero tokens")
    // empty frame
    assert(graft.operators.Packing.packSequences(
      docs.where(lit(false)), "text", "doc_id", 8).count() == 0)
  }

  test("connected components degenerate inputs: empty and null-bearing pair lists") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
    val withNulls = Seq((Option(1L), Option(2L)), (Option(3L), Option.empty[Long]))
      .toDF("id_a", "id_b")
    val comp = graft.operators.Dedup.connectedComponents(withNulls, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L), "null-edge rows name no node")
  }

  test("BM25 degenerate inputs: null text, empty corpus, query-only vocabulary") {
    val docs = Seq((Option(1L), Option("cat mat")), (Option(2L), Option.empty[String]))
      .toDF("doc_id", "text")
    val qs = Seq((0L, "cat")).toDF("query_id", "qtext")
    // null-text doc neither crashes the avgdl aggregate nor scores
    val hits = graft.operators.Bm25.topK(docs, "text", "doc_id",
      qs, "query_id", "qtext", k = 5)
      .collect().map(_.getLong(1)).toSeq
    assert(hits == Seq(1L))
    intercept[IllegalArgumentException] {
      graft.operators.Bm25.topK(docs.where(lit(false)), "text", "doc_id",
        qs, "query_id", "qtext", k = 5).collect()
    }
    // index build over a null-bearing corpus round-trips too
    val idx = graft.operators.Bm25.Bm25Index.build(docs, "text", "doc_id")
    assert(idx.topK(qs, "query_id", "qtext", k = 5)
      .collect().map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("SemDeDup degenerate inputs: null embeddings excluded, empty frame") {
    val e = Seq(
      (1L, Some(Seq(1.0, 0.0))), (2L, Some(Seq(1.0, 0.001))),
      (3L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "vec")
    val out = graft.operators.SemDedup.pruneWith(e, "vec", "vec_id",
      Array(Array(1.0, 0.0)), tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false),
      "null-embedding row is excluded, not crashed on")
    assert(graft.operators.SemDedup.pruneWith(e.where(lit(false)),
      "vec", "vec_id", Array(Array(1.0, 0.0)), 0.9).count() == 0)
  }

  test("temperature mix degenerate inputs: empty frame, single group") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(graft.operators.Sampling.temperatureMix(
      empty, "lang", "doc_id", 0.5).count() == 0)
    // a single group is its own binding group: kept whole at any alpha
    val one = Seq((1L, "en"), (2L, "en"), (3L, "en")).toDF("doc_id", "lang")
    assert(graft.operators.Sampling.temperatureMix(
      one, "lang", "doc_id", 0.3).count() == 3)
  }

  test("duplicateSpanScrub degenerate inputs: empty corpus, null/empty text, all-identical corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.duplicateSpanScrub(empty, "text", "doc_id").count() == 0)
    // null/empty text rows vanish (no tokens to keep), others unaffected
    val mixed = Seq((Option(1L), Option("one two three words here")),
      (Option(2L), Option.empty[String]), (Option(3L), Option("")))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicateSpanScrub(mixed, "text", "doc_id", n = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
    // every doc identical: exactly one survivor (the min id), intact
    val same = (1L to 6L).map(i => (i, "eight tokens of fully duplicated content right here"))
      .toDF("doc_id", "text")
    val kept = graft.operators.Dedup.duplicateSpanScrub(same, "text", "doc_id", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(kept.toSeq == Seq((1L, 0)), s"got ${kept.toSeq}")
  }

  test("URL + shard-export degenerate inputs: nulls flow, empty frames produce empty outputs") {
    import graft.functions.UrlFunctions._
    val urls = Seq(Option("https://a.example.com/x"), Option.empty[String])
      .toDF("u")
      .select(urlCanonicalize(col("u")).as("c"), urlHost(col("u")).as("h"),
        registrableDomain(urlHost(col("u"))).as("d"))
      .collect()
    assert(urls(0).getString(0) == "https://a.example.com/x" &&
      urls(0).getString(2) == "example.com")
    assert(urls(1).isNullAt(0) && urls(1).isNullAt(1) && urls(1).isNullAt(2))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.sources.ShardedExport.manifest(empty, "text", "doc_id", 4).count() == 0)
  }

  test("BPE degenerate inputs: empty corpus model, null text tokenizes empty") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = graft.functions.Bpe.fit(empty, "text", numMerges = 10)
    assert(m.merges.isEmpty)
    assert(m.encodeWord("anything") == Seq("a", "n", "y", "t", "h", "i", "n", "g·"))
    val docs = Seq((Option(1L), Option("cat")), (Option(2L), Option.empty[String]))
      .toDF("doc_id", "text")
    val counts = docs.select(col("doc_id"),
      graft.functions.Bpe.tokenCount(col("text"), m).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(2L) == 0, "null text → zero tokens")
    assert(counts(1L) == 3, "unmerged chars: c a t·")
  }

  test("LshIndex degenerate inputs: empty probe, empty corpus, null text") {
    val docs = Seq((1L, "spark query engines shuffle partition data across executors"),
      (2L, Option.empty[String].orNull)).toDF("doc_id", "text")
    val none = docs.where(lit(false))
    // empty corpus: probing an empty index yields no pairs, no error
    val emptyIdx = graft.operators.LshIndex.build(none, "text", "doc_id")
    assert(emptyIdx.probe(docs, "text", "doc_id").count() == 0)
    // empty probe against a real index; null-text corpus rows (no
    // shingles) simply never collide
    val idx = graft.operators.LshIndex.build(docs, "text", "doc_id")
    assert(idx.probe(none, "text", "doc_id").count() == 0)
    assert(idx.probe(docs.where(col("doc_id") === 2), "text", "doc_id").count() == 0)
  }

  test("leakageSafeSplit degenerate inputs: empty frame, null text, all-duplicates corpus") {
    val fr = Seq(("train", 0.5), ("test", 0.5))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = graft.operators.Sampling.leakageSafeSplit(empty, "text", "doc_id", fr)
    assert(out.columns.contains("split") && out.count() == 0)
    // null text rows are singletons (no shingles, no family) and still split
    val docs = Seq((1L, "aaaa bbbb cccc dddd eeee"), (2L, Option.empty[String].orNull),
      (3L, "aaaa bbbb cccc dddd eeee")).toDF("doc_id", "text")
    val split = graft.operators.Sampling.leakageSafeSplit(docs, "text", "doc_id", fr)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(split.size == 3)
    assert(split(1L) == split(3L), "exact-dup family must co-locate")
  }

  test("packSequencesBy degenerate counts: null and negative-free arbitrary columns") {
    val docs = Seq((0L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("doc_id", "text")
    // a count column with nulls: null packs as 0 tokens (doc still placed)
    val cnt = when(col("doc_id") === 1, lit(null).cast("int"))
      .otherwise((col("doc_id") * 3 + 1).cast("int"))
    val out = graft.operators.Packing
      .packSequencesBy(docs, cnt, "doc_id", budgetTokens = 8, streams = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 4)
    assert(out(1L)._3 == 0, "null count placed as zero-width")
    // layout tiles: every offset = running sum within its pack
    assert(out(0L) == ((0L, 0L, 1L)))
    assert(out(1L) == ((0L, 1L, 0L)))
    assert(out(2L) == ((0L, 1L, 7L)))   // 1+0+7 = 8 fits exactly
    assert(out(3L) == ((1L, 0L, 10L)))  // 10 > 8 opens pack 1, oversize alone
  }
}
