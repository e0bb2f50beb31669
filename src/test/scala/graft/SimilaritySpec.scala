package graft

import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("cosine expression: known vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12 && math.abs(got(1) - 1.0) < 1e-12)
  }

  test("zero-norm vectors survive normalization and rank last, no ANSI throw") {
    val df = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
    val unit = Similarity.withUnitVec(df, "embedding", "u")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(unit(0L) == Seq(0.0, 0.0)) // stays zero, not DIVIDE_BY_ZERO
    assert(math.abs(unit(1L).map(x => x * x).sum - 1.0) < 1e-12)
    val cz = df.filter(col("vec_id") === 0)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .head().getDouble(0)
    assert(cz == 0.0)
    // zero vector in the corpus: dot 0 against everything -> ranks last
    val out = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 1),
      "embedding", "vec_id", 3).collect()
    assert(out.length == 3)
    assert(out.maxBy(_.getAs[Int]("rank")).getAs[Long]("neighbor_id") == 0L)
  }

  test("brute-force top-k: k rows per query, descending scores, no self") {
    val queries = embeddings.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(embeddings, queries, "embedding", "vec_id", 5)
      .collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k: subset of candidates agrees with brute-force scores") {
    val queries = embeddings.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(embeddings, queries, "embedding", "vec_id", 50)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("score")).toMap
    val lsh = Similarity.lshTopK(embeddings, queries, "embedding", "vec_id",
      k = 5, dim = 64).collect()
    // every LSH hit must carry the exact same cosine as the brute-force path
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(b => assert(math.abs(b - r.getAs[Double]("score")) < 1e-12))
    }
  }

  test("IVF top-k: exact scores, high recall vs brute force, exact at nprobe=nlist") {
    val queries = embeddings.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(embeddings, queries, "embedding", "vec_id", 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("score")).toMap
    val ivf = Similarity.ivfTopK(embeddings, queries, "embedding", "vec_id",
      k = 10, nlist = 8, nprobe = 4).collect()
    // scores are exact cosines wherever brute force agrees
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(b => assert(math.abs(b - r.getAs[Double]("score")) < 1e-12))
    }
    // probing half the cells should recover a healthy share of true top-10
    val recall = ivf.count(r =>
      brute.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
      .toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall")
    // nprobe == nlist probes every cell ⇒ identical neighbor sets to brute
    val full = Similarity.ivfTopK(embeddings, queries, "embedding", "vec_id",
      k = 10, nlist = 8, nprobe = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(full == brute.keySet)
  }

  test("auto-nlist default: tracks n by the 4*sqrt(n) rule, capped; explicit value wins") {
    import graft.operators.Similarity
    // the growth rule itself
    assert(Similarity.autoNlist(100) == 25)           // 4*10=40 > n/4=25
    assert(Similarity.autoNlist(10000) == 400)        // 4*100
    assert(Similarity.autoNlist(1000000) == 4000)     // 4*1000
    assert(Similarity.autoNlist(100000000) == 4096)   // cap
    assert(Similarity.autoNlist(100000000, cap = 65536) == 40000)
    assert(Similarity.autoNlist(20) == 16)            // floor
    // un-knobbed build engages it: centroid count tracks the corpus size
    val idx = Similarity.IvfIndex.build(embeddings, "embedding", "vec_id")
    val n = embeddings.count()
    assert(idx.centroids.length == Similarity.autoNlist(n),
      s"default build fitted ${idx.centroids.length} cells for n=$n")
    // an explicit value still wins (the gates pin nlist=16)
    val fixed = Similarity.IvfIndex.build(embeddings, "embedding", "vec_id", nlist = 8)
    assert(fixed.centroids.length == 8)
  }

  test("IvfIndex: build once serves many batches; save/load round-trips with no re-fit") {
    import graft.operators.Similarity.IvfIndex
    val idx = IvfIndex.build(embeddings, "embedding", "vec_id", nlist = 8, seed = 42L)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val batch1 = embeddings.filter(col("vec_id") < 3)
    val batch2 = embeddings.filter(col("vec_id") >= 3 && col("vec_id") < 6)
    // identical to a fresh ivfTopK per batch (same quantizer recipe/seed)
    assert(res(idx.topK(batch1, "embedding", "vec_id", k = 10, nprobe = 4)) ==
      res(Similarity.ivfTopK(embeddings, batch1, "embedding", "vec_id", 10, 8, 4)))
    assert(res(idx.topK(batch2, "embedding", "vec_id", k = 10, nprobe = 4)) ==
      res(Similarity.ivfTopK(embeddings, batch2, "embedding", "vec_id", 10, 8, 4)))

    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    idx.save(dir)
    // cells land partitioned by cell id — the probe-pruning layout
    assert(new java.io.File(s"$dir/cells").listFiles().exists(_.getName.startsWith("__cell=")))
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    assert(res(loaded.topK(batch1, "embedding", "vec_id", k = 10, nprobe = 4)) ==
      res(idx.topK(batch1, "embedding", "vec_id", k = 10, nprobe = 4)))
    // centroid-table mutation (the LshIndex.load discipline): a renamed
    // field must fail at load naming it, not swap cell ids for coords
    import spark.implicits._
    Seq((0, Seq(0.0))).toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    val e = intercept[IllegalArgumentException] { IvfIndex.load(spark, dir) }
    assert(e.getMessage.contains("cell"))
  }

  test("IvfIndex.append: frozen-quantizer growth; exact at nprobe = nlist") {
    import graft.operators.Similarity.IvfIndex
    val first = embeddings.filter(col("vec_id") % 3 =!= 0)
    val more = embeddings.filter(col("vec_id") % 3 === 0)
    val idx = IvfIndex.build(first, "embedding", "vec_id", nlist = 8, seed = 42L)
    val grown = idx.append(more, "embedding", "vec_id")
    // quantizer untouched; corpus grew
    assert(grown.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    assert(grown.cells.count() == embeddings.count())
    // probing every cell makes the candidate set the full corpus, so the
    // appended index must equal brute force over the union exactly
    val q = embeddings.filter(col("vec_id") < 4)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    assert(res(grown.topK(q, "embedding", "vec_id", k = 10, nprobe = 8)) ==
      res(Similarity.bruteForceTopK(embeddings, q, "embedding", "vec_id", 10)))
    // appended rows are retrievable through normal (pruned) probing
    val someNew = res(grown.topK(q, "embedding", "vec_id", k = 10, nprobe = 4))
      .exists { case (_, n, _) => n % 3 == 0 }
    assert(someNew, "appended vectors must appear in probe results")
  }

  test("IvfIndex.remove: append's exact inverse; searches never return removed ids") {
    import graft.operators.Similarity.IvfIndex
    val a = embeddings.filter(col("vec_id") % 3 =!= 0)
    val b = embeddings.filter(col("vec_id") % 3 === 0)
    val base = IvfIndex.build(a, "embedding", "vec_id", nlist = 8, seed = 42L)
    val roundTrip = base.append(b, "embedding", "vec_id")
      .remove(b.select("vec_id"))
    // centroids untouched, cells exactly the pre-append frame
    assert(roundTrip.centroids.map(_.toSeq).toSeq == base.centroids.map(_.toSeq).toSeq)
    def cellSet(i: IvfIndex) = i.cells
      .select("neighbor_id", "__cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cellSet(roundTrip) == cellSet(base))
    // a full-corpus index after remove: results equal brute force over
    // the survivors at nprobe = nlist, and no removed id ever surfaces
    val removed = IvfIndex.build(embeddings, "embedding", "vec_id",
      nlist = 8, seed = 42L).remove(b.select("vec_id"))
    val q = embeddings.filter(col("vec_id") < 4)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val got = res(removed.topK(q, "embedding", "vec_id", k = 10, nprobe = 8))
    assert(got.forall { case (_, n, _) => n % 3 != 0 },
      "a removed id surfaced from the index")
    assert(got == res(Similarity.bruteForceTopK(a, q, "embedding", "vec_id", 10)))
  }

  test("IvfIndex.nearDupAgainst: exact at nprobe = nlist; candidates exact-verified at the gate cover") {
    import graft.operators.Similarity.IvfIndex
    val corpus = embeddings.filter(col("vec_id") % 7 =!= 0)
    val probe = embeddings.filter(col("vec_id") % 7 === 0)
    val idx = IvfIndex.build(corpus, "embedding", "vec_id", nlist = 8, seed = 42L)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact cross-filter ground truth
    val u = Similarity.withUnitVec(embeddings, "embedding", "__u")
      .select(col("vec_id"), col("__u"))
    graft.plans.GraftExtensions.register(spark)
    val exact = u.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("probe_id"), col("__u").as("__p"))
      .crossJoin(u.filter(col("vec_id") % 7 =!= 0)
        .select(col("vec_id").as("corpus_id"), col("__u").as("__c")))
      .where(graft.plans.GraftExtensions.dotArr(col("__p"), col("__c")) >= 0.4)
      .select("probe_id", "corpus_id")
    // nprobe = nlist probes every cell: exact by construction
    assert(pairs(idx.nearDupAgainst(probe, "embedding", "vec_id", 0.4, nprobe = 8))
      == pairs(exact))
    // candidates are exact-verified: no spurious pair at ANY cover
    val narrow = pairs(idx.nearDupAgainst(probe, "embedding", "vec_id", 0.4, nprobe = 2))
    assert(narrow.subsetOf(pairs(exact)))
  }

  test("near-dup pairs symmetric-free and thresholded") {
    val pairs = Similarity.embeddingNearDupPairs(embeddings, "embedding", "vec_id", 0.4)
      .collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
  }

  test("near-dup auto-switch: past the cutoff the LSH path engages with exact cosines") {
    val exact = Similarity.embeddingNearDupPairs(
      embeddings, "embedding", "vec_id", 0.4, approximate = Some(false))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cosine")).toMap
    // exactCutoff = 0 drives the auto-selection down the approximate branch
    val auto = Similarity.embeddingNearDupPairs(
      embeddings, "embedding", "vec_id", 0.4, exactCutoff = 0L)
      .collect()
    // LSH output is a subset of exact pairs (no false positives — the
    // verify cosine is exact) and every hit carries the exact cosine
    auto.foreach { r =>
      val key = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(exact.contains(key), s"LSH produced non-near-dup pair $key")
      assert(math.abs(exact(key) - r.getAs[Double]("cosine")) < 1e-12)
    }
    assert(auto.length >= (exact.size * 0.8).toInt,
      s"LSH recall too low: ${auto.length}/${exact.size}")
    // below the cutoff the auto path must equal the exact path bit-for-bit
    val autoExact = Similarity.embeddingNearDupPairs(
      embeddings, "embedding", "vec_id", 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(autoExact == exact)
  }

  test("multimodal: real PNG round-trip — encode, header decode, features, resize") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        (pmod(col("doc_id"), lit(7)) + 3).cast("int").as("w"),
        (pmod(col("doc_id"), lit(5)) + 2).cast("int").as("h"))
      .limit(20)
    val png = Multimodal.withSyntheticPng(d, "w", "h", "payload")
    val out = Multimodal.withFeatures(Multimodal.withDecodedMeta(png, "payload"), "payload")
    val rows = out.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("media_meta"))
      // javax.imageio must recover the exact synthesized dimensions
      assert(meta.getAs[String]("format") == "png")
      assert(meta.getAs[Int]("width") == r.getAs[Int]("w"))
      assert(meta.getAs[Int]("height") == r.getAs[Int]("h"))
      assert(meta.getAs[Int]("channels") == 3)
      assert(meta.getAs[Long]("n_bytes") > 0)
      val feats = r.getSeq[Float](r.fieldIndex("features"))
      assert(feats.length == Multimodal.FeatureDim)
      // spatial luminance means are real pixel statistics in [0,1]
      assert(feats.forall(f => f >= 0.0f && f <= 1.0f))
      assert(feats.exists(_ > 0.0f))
    }
    // deterministic across partitionings
    val again = Multimodal.withFeatures(Multimodal.withDecodedMeta(
      png.repartition(5), "payload"), "payload")
      .orderBy("doc_id").collect().map(r => r.getSeq[Float](r.fieldIndex("features")).toList)
    assert(out.orderBy("doc_id").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq == again.toSeq)
    // real pixel resize: re-decoded dims equal the target
    val resized = Multimodal.withDecodedMeta(
      Multimodal.resizedPayload(png, "payload", 8, 6), "resized_payload", "rmeta")
    resized.collect().foreach { r =>
      val meta = r.getStruct(r.fieldIndex("rmeta"))
      assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 6)
    }
  }

  test("multimodal: undecodable payloads fall back deterministically") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text").cast("binary").as("payload")).limit(10)
    val out = Multimodal.withFeatures(Multimodal.withDecodedMeta(d, "payload"), "payload")
    out.collect().foreach { r =>
      val meta = r.getStruct(r.fieldIndex("media_meta"))
      assert(meta.getAs[String]("format") == "unknown")
      assert(meta.getAs[Int]("width") == -1)
      assert(meta.getAs[Long]("n_bytes") > 0)
      // byte-moment fallback features still populate
      assert(r.getSeq[Float](r.fieldIndex("features")).length == Multimodal.FeatureDim)
    }
  }

  test("audio: WAV synth → chunk-walking decode round-trips, features are real DSP") {
    import graft.operators.Multimodal.AudioCodec
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000).cast("int").as("rate"),
        ((pmod(col("doc_id"), lit(50)) + 1) * 160).cast("int").as("n_in"))
      .limit(20)
    val wav = Multimodal.withSyntheticWav(d, "rate", "n_in")
    val out = Multimodal.withAudioFeatures(
      Multimodal.withAudioMeta(wav, "audio_payload"), "audio_payload")
    out.collect().foreach { r =>
      val meta = r.getStruct(r.fieldIndex("audio_meta"))
      assert(meta.getAs[String]("format") == "wav")
      assert(meta.getAs[Int]("sample_rate") == r.getAs[Int]("rate"))
      assert(meta.getAs[Int]("channels") == 1)
      assert(meta.getAs[Long]("n_samples") == r.getAs[Int]("n_in").toLong)
      assert(meta.getAs[Long]("duration_ms") ==
        r.getAs[Int]("n_in").toLong * 1000L / r.getAs[Int]("rate"))
      val feats = r.getSeq[Float](r.fieldIndex("audio_features"))
      assert(feats.length == Multimodal.FeatureDim)
      // a sine tone has substantial RMS in every window…
      assert(feats.take(Multimodal.FeatureDim / 2).forall(_ > 1000f))
      // …and a zero-crossing rate ≈ 2·freq/rate, strictly inside (0, 1)
      assert(feats.drop(Multimodal.FeatureDim / 2).forall(z => z > 0f && z < 1f))
    }

    // zero-crossing rate quantitatively matches the synthesized tone
    val one = AudioCodec.synthWav(8000, 8000, seed = 42)
    val freq = 110.0 + 42 % 880
    val zc = AudioCodec.features(one).drop(Multimodal.FeatureDim / 2).sum /
      (Multimodal.FeatureDim / 2)
    assert(math.abs(zc - 2 * freq / 8000) < 0.01, s"zc=$zc expected=${2 * freq / 8000}")

    // RIFF walker skips unknown chunks (LIST before fmt/data)
    val base = AudioCodec.synthWav(8000, 16, seed = 1)
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val padded = base.take(12) ++ listChunk ++ base.drop(12)
    // fix the RIFF size field (not validated, but keep it honest)
    val (fmt, rate, ch, n, _) = AudioCodec.decodeMeta(padded)
    assert(fmt == "wav" && rate == 8000 && ch == 1 && n == 16)

    // corrupt payloads fall back, never throw
    assert(AudioCodec.decodeMeta("not audio".getBytes)._1 == "unknown")
    assert(AudioCodec.decodeMeta(null)._1 == "unknown")
    assert(AudioCodec.decodeMeta(base.take(30))._1 == "unknown")
    assert(AudioCodec.features("junk".getBytes).forall(_ == 0f))
    // adversarial chunk size with the sign bit set (0x80000000): the
    // Int-overflow walk would go out of bounds; the Long walk falls back
    val evil = base.clone()
    evil(16) = 0; evil(17) = 0; evil(18) = 0; evil(19) = 0x80.toByte // fmt size
    assert(AudioCodec.decodeMeta(evil)._1 == "unknown")
    val evil2 = base.clone()
    evil2(40) = 0xff.toByte; evil2(41) = 0xff.toByte
    evil2(42) = 0xff.toByte; evil2(43) = 0xff.toByte // data size = 0xffffffff
    val (f2, _, _, n2, _) = AudioCodec.decodeMeta(evil2)
    assert(f2 == "wav" && n2 == 16) // clamped to the real payload
  }

  test("mp4: ISO-BMFF synth → box-walking parse round-trips v0, v1, largesize and corrupt payloads") {
    import graft.operators.Multimodal.Mp4Codec
    // v0 layout (all times fit u32), video-only
    val v0 = Mp4Codec.synthMp4(width = 640, height = 360, timescale = 600,
      duration = 9000, withAudio = false, payloadBytes = 32, seed = 7)
    assert(Mp4Codec.parseMeta(v0) == ("isom", 600L, 9000L, 1, 640, 360, "vide"))
    // v1 layout forced by a duration past u32; audio track present
    val v1 = Mp4Codec.synthMp4(width = 1920, height = 1080, timescale = 90000,
      duration = 4294967296L + 450000L, withAudio = true, payloadBytes = 32, seed = 8)
    assert(Mp4Codec.parseMeta(v1) ==
      ("isom", 90000L, 4294967296L + 450000L, 2, 1920, 1080, "vide,soun"))
    // determinism
    assert(java.util.Arrays.equals(v0, Mp4Codec.synthMp4(640, 360, 600, 9000,
      withAudio = false, payloadBytes = 32, seed = 7)))

    // size==1 → u64 largesize header on a top-level box (spec §4.2):
    // rewrite mdat with a largesize header; the walk must still land on
    // the box boundaries (metadata unchanged)
    val mdatStart = v0.length - (8 + 32)
    val big = v0.take(mdatStart) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, (16 + 32).toByte) ++
      v0.drop(mdatStart + 8)
    assert(Mp4Codec.parseMeta(big) == ("isom", 600L, 9000L, 1, 640, 360, "vide"))
    // size==0 → to end of file on the last box
    val toEof = v0.clone()
    toEof(mdatStart) = 0; toEof(mdatStart + 1) = 0
    toEof(mdatStart + 2) = 0; toEof(mdatStart + 3) = 0
    assert(Mp4Codec.parseMeta(toEof) == ("isom", 600L, 9000L, 1, 640, 360, "vide"))

    // corrupt payloads fall back, never throw
    assert(Mp4Codec.parseMeta(null)._1 == "unknown")
    assert(Mp4Codec.parseMeta("not a movie at all".getBytes)._1 == "unknown")
    assert(Mp4Codec.parseMeta(Array.fill(64)(0x41.toByte))._1 == "unknown")
    // truncation inside moov: ftyp still reads, the walker stops clean
    val trunc = v0.take(40)
    assert(Mp4Codec.parseMeta(trunc)._1 == "isom")
    // a box claiming a size past the buffer must not read out of bounds
    val evil = v0.clone()
    evil(0) = 0x7f.toByte
    assert(Mp4Codec.parseMeta(evil)._1 == "unknown")
  }

  test("frame sampling explodes deterministic frame indices") {
    val d = Seq((1L)).toDF("doc_id")
    val frames = Multimodal.sampleFrames(d, "doc_id", nFrames = 4, every = 10)
      .collect().map(_.getAs[Int]("frame_idx"))
    assert(frames.toSeq == Seq(0, 10, 20, 30))
  }

  test("video container: synth → parse → sample → per-frame decode round-trips") {
    import graft.operators.Multimodal.VideoCodec
    val v = VideoCodec.synthVideo(w = 6, h = 3, nFrames = 5, seed = 9L)
    assert(VideoCodec.frameCount(v) == 5)
    val sampled = VideoCodec.sampleFrames(v, every = 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4))
    sampled.foreach { case (_, frame) =>
      val (fmt, w, h, c) = Multimodal.ImageCodec.decodeMeta(frame)
      assert(fmt == "png" && w == 6 && h == 3 && c == 3)
    }
    // frames differ (per-frame seed), so sampling is not returning one frame
    assert(sampled.map(_._2.toSeq).distinct.size == 3)
    // corrupt/truncated payloads are total
    assert(VideoCodec.frameCount("nope".getBytes) == -1)
    assert(VideoCodec.sampleFrames(null, 2).isEmpty)
    assert(VideoCodec.sampleFrames(v.take(v.length - 3), 1).map(_._1) == Seq(0, 1, 2, 3))
    // DataFrame-level explode: one row per sampled frame, payloads stay partition-local
    val df = Seq((1L, v)).toDF("doc_id", "video")
    val rows = Multimodal.explodeSampledFrames(df, "video", every = 2).collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4))
    assert(rows.forall(r => r.getStruct(r.fieldIndex("frame_meta")).getAs[Int]("width") == 6))
  }

  test("dHash: re-encode identical, near for perturbed/resized, far for unrelated") {
    import graft.operators.Multimodal
    import Multimodal.ImageCodec
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val img = ImageCodec.synthPng(48, 32, 7L)
    val h0 = Multimodal.dHashBytes(img)
    // byte-identical synth → identical hash
    assert(Multimodal.dHashBytes(ImageCodec.synthPng(48, 32, 7L)) == h0)
    // one-pixel perturbation: decode, flip a pixel, re-encode
    val buf = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
    buf.setRGB(0, 0, 0xFFFFFF ^ buf.getRGB(0, 0))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "png", bos)
    val hPerturbed = Multimodal.dHashBytes(bos.toByteArray)
    assert(ham(h0, hPerturbed) <= 4, s"perturbed hamming ${ham(h0, hPerturbed)}")
    // 2x upscale (bilinear re-sample + re-encode): perceptually same image
    val hResized = Multimodal.dHashBytes(ImageCodec.resizePng(img, 96, 64))
    assert(ham(h0, hResized) <= 12, s"resized hamming ${ham(h0, hResized)}")
    // unrelated image: far
    val hOther = Multimodal.dHashBytes(ImageCodec.synthPng(48, 32, 8L))
    assert(ham(h0, hOther) >= 16, s"unrelated hamming ${ham(h0, hOther)}")
    // undecodable payloads: deterministic byte-window fallback, no throw
    val junk = Array.tabulate[Byte](500)(i => (i * 31).toByte)
    assert(Multimodal.dHashBytes(junk) == Multimodal.dHashBytes(junk.clone))
    assert(Multimodal.dHashBytes(null) == 0L && Multimodal.dHashBytes(Array.empty) == 0L)
  }

  test("imageNearDupPairs: banded Hamming join finds planted duplicate groups, payloads never join") {
    import graft.operators.Multimodal
    val synth = udf((i: Long) => Multimodal.ImageCodec.synthPng(24, 16, i % 5))
    val imgs = spark.range(30).select(col("id"), synth(col("id")).as("payload"))
    val pairs = Multimodal.imageNearDupPairs(imgs, "payload", "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 5 groups of 6 → C(6,2)=15 pairs each, all at hamming 0
    assert(pairs.length == 75, s"${pairs.length} pairs")
    assert(pairs.forall(_._3 == 0))
    assert(pairs.forall { case (a, b, _) => a % 5 == b % 5 && a < b })
  }

  test("audioHash: volume-invariant, re-encode identical, distinct tones far; banded pairs recover groups") {
    import graft.operators.Multimodal
    import Multimodal.AudioCodec
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val wav = AudioCodec.synthWavSweep(8000, 4000, 11L)
    val h0 = Multimodal.audioHashBytes(wav)
    assert(Multimodal.audioHashBytes(AudioCodec.synthWavSweep(8000, 4000, 11L)) == h0)
    // uniform gain preserves every energy-gradient sign: halve the volume
    val half = wav.clone()
    var i = 44
    while (i + 1 < half.length) {
      val s = ((half(i) & 0xFF) | (half(i + 1) << 8)).toShort / 2
      half(i) = s.toByte; half(i + 1) = (s >> 8).toByte
      i += 2
    }
    assert(ham(h0, Multimodal.audioHashBytes(half)) <= 2,
      s"volume hamming ${ham(h0, Multimodal.audioHashBytes(half))}")
    // a different seed = different sweep/AM structure: far
    val hOther = Multimodal.audioHashBytes(AudioCodec.synthWavSweep(8000, 4000, 12L))
    assert(ham(h0, hOther) >= 12, s"unrelated hamming ${ham(h0, hOther)}")
    // undecodable payloads: deterministic fallback, no throw
    val junk = Array.tabulate[Byte](300)(i => (i * 17).toByte)
    assert(Multimodal.audioHashBytes(junk) == Multimodal.audioHashBytes(junk.clone))
    assert(Multimodal.audioHashBytes(null) == 0L)

    val synth = udf((i: Long) => AudioCodec.synthWavSweep(8000, 2000, i % 4))
    val wavs = spark.range(16).select(col("id"), synth(col("id")).as("payload"))
    val pairs = Multimodal.audioNearDupPairs(wavs, "payload", "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 24, s"${pairs.length} pairs") // 4 groups of 4 -> 6 each
    assert(pairs.forall { case (a, b) => a % 4 == b % 4 && a < b })
  }

  test("videoNearDupPairs: positional frame matching with the match-fraction gate") {
    import graft.operators.Multimodal
    import Multimodal.{ImageCodec, VideoCodec}
    // clip 0/1: identical; clip 2: shares frames 0,2 (of sampled 0,2,4)
    // with clip 0 but differs at 4 -> 2/3 matches, passes frac 0.5;
    // clip 3: unrelated everywhere
    def clip(frameSeeds: Seq[Long]): Array[Byte] = {
      val frames = frameSeeds.map(ss => ImageCodec.synthPng(16, 12, ss))
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte]('G', 'V', 'I', 'D'))
      def put32(v: Int): Unit = bos.write(Array[Byte](
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
      put32(frames.length)
      frames.foreach { fr => put32(fr.length); bos.write(fr) }
      bos.toByteArray
    }
    val base = Seq(100L, 101L, 102L, 103L, 104L, 105L)
    val rows = Seq(
      (0L, clip(base)),
      (1L, clip(base)),
      (2L, clip(Seq(100L, 101L, 102L, 103L, 999L, 105L))),
      (3L, clip(Seq(900L, 901L, 902L, 903L, 904L, 905L))))
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val pairs = Multimodal.videoNearDupPairs(df, "payload", "id",
      every = 2, maxHamming = 3, minMatchFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(pairs((0L, 1L)) == ((3L, 3L)))
    assert(pairs((0L, 2L)) == ((2L, 3L)) && pairs((1L, 2L)) == ((2L, 3L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    assert(pairs.size == 3)
    // corrupt payload: no frames decoded, no pairs, no throw
    val junkRows = rows :+ (4L, Array.tabulate[Byte](64)(_.toByte))
    val withJunk = Multimodal.videoNearDupPairs(
      spark.createDataFrame(junkRows).toDF("id", "payload"), "payload", "id",
      every = 2, maxHamming = 3, minMatchFrac = 0.5).collect()
    assert(withJunk.length == 3)
  }

  test("hardNegatives: cross-label only, ranked within the filtered set; indexed path recalls") {
    import graft.operators.Similarity
    val e = embeddings.withColumn("label", pmod(col("vec_id"), lit(4)))
    val anchors = e.filter(col("vec_id") < 4)
    val hn = Similarity.hardNegatives(e, anchors, "embedding", "vec_id", "label", k = 5)
      .collect()
    val byQ = hn.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      // every neighbor carries a DIFFERENT label from its anchor
      rows.foreach(r => assert(r.getAs[Long]("neighbor_label") != q % 4))
      // ranked within the filtered set: scores descend
      val sc = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
    // positives mode returns only same-label neighbors
    val pos = Similarity.hardNegatives(e, anchors, "embedding", "vec_id", "label",
      k = 3, positives = true).collect()
    pos.foreach(r => assert(
      r.getAs[Long]("neighbor_label") == r.getAs[Long]("query_id") % 4))
    // indexed path: exact cosines; high overlap with the exact set at
    // full probe (nprobe = nlist scans every cell)
    val idx = Similarity.IvfIndex.build(e, "embedding", "vec_id", nlist = 8)
    val viaIdx = Similarity.hardNegativesIndexed(idx, anchors, "embedding", "vec_id",
      e.select("vec_id", "label"), "label", k = 5, nprobe = 8, overFetch = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exactSet = hn.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert((viaIdx intersect exactSet).size >= (exactSet.size * 0.8).toInt,
      s"indexed overlap ${(viaIdx intersect exactSet).size}/${exactSet.size}")
  }

  test("bitextMine: candidate law, margin normalization, gate boundary gaps") {
    import org.apache.spark.sql.functions._
    val a = embeddings.where(pmod(col("vec_id"), lit(2)) === 0)
    val b = embeddings.where(pmod(col("vec_id"), lit(2)) =!= 0)
    val all = Similarity.bitextMine(a, b, "embedding", "vec_id",
      k = 4, threshold = -10).collect()
    // every returned pair is a forward NN1 or a backward NN1 — never an
    // arbitrary A×B pair — and directions dedupe (one row per (a, b))
    val pairs = all.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    val nA = a.count(); val nB = b.count()
    assert(all.length <= nA + nB, "at most one candidate per direction origin")
    assert(all.length >= math.max(nA, nB), "every origin contributes its NN1")
    // hubness normalization: margins straddle 1 (a hub's pairs divide by
    // its own high kNN mean and fall below 1)
    val margins = all.map(_.getDouble(3))
    assert(margins.exists(_ < 1.0) && margins.exists(_ > 1.0))
    // thresholding is a pure filter of the full frame
    val thr = Similarity.bitextMine(a, b, "embedding", "vec_id",
      k = 4, threshold = 1.02).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(thr == all.filter(_.getDouble(3) >= 1.02)
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // gate-stability pin, on RAW (pre-rounding) quantities recomputed
    // driver-side at BOTH gate scales: the cross-engine oracle trust
    // needs (a) every raw margin and raw score to sit away from the
    // 1e-4 rounding midpoints (so both engines' ulp-different doubles
    // round identically), (b) every NN1 choice decided by a gap ≫
    // double noise, and (c) the gate threshold inside a rounded-margin
    // gap. Asserting on post-rounding margins would only prove no
    // ROUNDED margin equals the threshold. Measured floors (round 13):
    // margin mid-dist ≥ 2.6e-3, score mid-dist ≥ 3.4e-4 (both in
    // boundary units), NN1 gap ≥ 3.3e-5, |margin − 1.02| ≥ 1.4e-4.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val rows = Tables.embeddings(spark, dir)
        .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def unit(v: Array[Double]): Array[Double] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
      val as = rows.filter(_._1 % 2 == 0).map { case (i, v) => (i, unit(v)) }
      val bs = rows.filter(_._1 % 2 != 0).map { case (i, v) => (i, unit(v)) }
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      // per-origin score lists sorted (score desc, other-id asc)
      def tops(side: Array[(Long, Array[Double])],
          other: Array[(Long, Array[Double])]): Map[Long, Array[(Double, Long)]] =
        side.map { case (i, v) =>
          i -> other.map { case (j, w) => (dot(v, w), j) }
            .sortBy { case (sc, j) => (-sc, j) }
        }.toMap
      val ta = tops(as, bs)
      val tb = tops(bs, as)
      // (b) NN1 decided by a real gap on every origin, both directions
      (ta.values ++ tb.values).foreach { t =>
        assert(t(0)._1 - t(1)._1 > 1e-5, s"NN1 near-tie in $dir")
      }
      val avgA = ta.map { case (i, t) => i -> t.take(4).map(_._1).sum / 4.0 }
      val avgB = tb.map { case (j, t) => j -> t.take(4).map(_._1).sum / 4.0 }
      val cands = (ta.map { case (i, t) => (i, t(0)._2) } ++
        tb.map { case (j, t) => (t(0)._2, j) }).toSet
      def midDist(x: Double): Double = {
        val y = x * 1e4 + 0.5
        math.abs(y - math.round(y))
      }
      cands.foreach { case (i, j) =>
        val sc = ta(i).find(_._2 == j).get._1
        val m = sc / ((avgA(i) + avgB(j)) / 2)
        // (a) away from rounding midpoints, in boundary units
        assert(midDist(m) > 1e-3, s"raw margin $m near midpoint in $dir")
        assert(midDist(sc) > 1e-4, s"raw score $sc near midpoint in $dir")
        // (c) rounded margin clear of the 1.02 gate threshold
        assert(math.abs(math.floor(m * 1e4 + 0.5) / 1e4 - 1.02) > 1e-4 / 2,
          s"margin $m hugs the gate threshold in $dir")
      }
    }
  }

  test("bitextMine: planted parallel pair wins with a high margin") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // side A row 100 and side B row 101 share (jittered) coordinates —
    // a genuine translation pair among unrelated vectors
    val dim = 8
    def vec(seed: Int) = (0 until dim).map(j => math.sin(seed * 31 + j * 7 + 1).toFloat)
    val aRows = Seq((100L, vec(1)), (102L, vec(2)), (104L, vec(3)), (106L, vec(4)))
    val bRows = Seq((101L, vec(1).map(x => x * 1.01f)), (103L, vec(5)),
      (105L, vec(6)), (107L, vec(7)))
    val a = aRows.toDF("vec_id", "embedding")
    val b = bRows.toDF("vec_id", "embedding")
    val m = Similarity.bitextMine(a, b, "embedding", "vec_id", k = 2, threshold = -10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val planted = m((100L, 101L))
    assert(m.keySet.contains((100L, 101L)))
    assert(m.filterKeys(_ != ((100L, 101L))).values.forall(_ < planted),
      s"planted pair must carry the top margin: $m")
  }

  test("bitextMineIndexed: equals the exact form at nprobe = nlist") {
    import org.apache.spark.sql.functions._
    val a = embeddings.where(pmod(col("vec_id"), lit(2)) === 0)
    val b = embeddings.where(pmod(col("vec_id"), lit(2)) =!= 0)
    val nlist = 8
    val idxA = Similarity.IvfIndex.build(a, "embedding", "vec_id", nlist = nlist)
    val idxB = Similarity.IvfIndex.build(b, "embedding", "vec_id", nlist = nlist)
    val exact = Similarity.bitextMine(a, b, "embedding", "vec_id",
      k = 4, threshold = 1.02).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val indexed = Similarity.bitextMineIndexed(a, b, idxA, idxB,
      "embedding", "vec_id", k = 4, threshold = 1.02, nprobe = nlist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(indexed.sameElements(exact),
      s"full-probe indexed must equal exact: ${indexed.length} vs ${exact.length}")
    // at a partial probe the output is a subset-or-equal candidate set
    val partial = Similarity.bitextMineIndexed(a, b, idxA, idxB,
      "embedding", "vec_id", k = 4, threshold = 1.02, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partial.nonEmpty)
  }

  test("meanPoolBy: hand-checked means, ragged pooling, partitioning invariance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "a", Seq(1.0f, 2.0f, 3.0f)),
      (2L, "a", Seq(3.0f, 4.0f, 5.0f)),
      (3L, "b", Seq(10.0f, 20.0f)),         // ragged: shorter vector
      (4L, "b", Seq(30.0f, 40.0f, 50.0f)),
      (5L, "c", null.asInstanceOf[Seq[Float]])) // null drops; group vanishes
      .toDF("id", "grp", "embedding")
    val got = Similarity.meanPoolBy(df, "embedding", "grp")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 3.0, 4.0))
    // position 2 exists only in id 4 → mean over the one row that has it
    assert(got("b") == Seq(20.0, 30.0, 50.0))
    assert(!got.contains("c"))
    // partitioning invariance (exact-decimal addends)
    val e = embeddings.withColumn("grp", pmod(col("vec_id"), lit(16)))
    val a = Similarity.meanPoolBy(e, "embedding", "grp")
      .orderBy("grp").collect().map(_.getSeq[Double](1))
    val b = Similarity.meanPoolBy(e.repartition(13), "embedding", "grp")
      .orderBy("grp").collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("semanticDecontaminate: survivors law, planted near-dup removed, tau gap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val evalSet = embeddings.where(pmod(col("vec_id"), lit(31)) === 0)
    val corpus = embeddings.where(pmod(col("vec_id"), lit(31)) =!= 0)
    val out = Similarity.semanticDecontaminate(corpus, evalSet,
      "embedding", "vec_id", tau = 0.377)
    // survivors are a subset of the corpus, schema untouched
    assert(out.columns.sameElements(corpus.columns))
    val survivors = out.select("vec_id").collect().map(_.getLong(0)).toSet
    val corpusIds = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(corpusIds))
    // plant a paraphrase: a corpus vector 0.99-cosine to an eval vector
    // must be dropped at any sane tau, and the rest of the verdicts are
    // unchanged by its presence
    val ev0 = evalSet.orderBy("vec_id").limit(1)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val planted = Seq((999999L, ev0.map(x => x * 1.001f).toSeq))
      .toDF("vec_id", "embedding")
    val withPlant = Similarity.semanticDecontaminate(
      corpus.select("vec_id", "embedding").unionByName(planted), evalSet,
      "embedding", "vec_id", tau = 0.377)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!withPlant.contains(999999L), "planted paraphrase must be dropped")
    assert(withPlant == survivors, "verdicts are per-document")
    // null-embedding policy: a corpus row with no vector cannot be
    // assessed and SURVIVES (explicit in the operator, COALESCE-mirrored
    // in the oracle) — other verdicts unchanged by its presence
    val nullRow = Seq((999998L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val withNull = Similarity.semanticDecontaminate(
      corpus.select("vec_id", "embedding").unionByName(nullRow), evalSet,
      "embedding", "vec_id", tau = 0.377)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(withNull.contains(999998L), "null-embedding row must survive")
    assert(withNull - 999998L == survivors, "null row must not change verdicts")
    // tau sits in a measured gap: no max-cos within 1e-4 of the boundary
    val gap = Similarity.withUnitVec(corpus, "embedding", "__cv")
      .select(col("vec_id"), col("__cv"))
      .crossJoin(broadcast(Similarity.withUnitVec(evalSet, "embedding", "__ev")
        .select(col("vec_id").as("__eid"), col("__ev"))))
      .withColumn("__s", graft.plans.GraftExtensions.cosineSim(col("__cv"), col("__ev")))
      .groupBy("vec_id").agg(max("__s").as("m"))
      .where(abs(col("m") - 0.377) < 1e-4).count()
    assert(gap == 0, "tau must sit in a max-cos gap (refit after testdata regen)")
  }

  test("knnGraph: indexed form at nprobe = nlist equals the exact graph") {
    val exact = Similarity.knnGraph(embeddings, "embedding", "vec_id", 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val indexed = Similarity.knnGraphIndexed(embeddings, "embedding", "vec_id", 5,
        nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact == indexed,
      s"only-exact=${(exact -- indexed).take(5)} only-indexed=${(indexed -- exact).take(5)}")
    assert(exact.nonEmpty && exact.groupBy(_._1).forall(_._2.size == 5))
  }

  test("knnGraph: gate rank boundaries decided by real gaps at both gate scales") {
    // the q_knn_graph/q_semantic_families oracle trust argument: Spark
    // ranks by normalize-then-dot, DuckDB by list_cosine_similarity over
    // raw vectors — ulp-different doubles. Every ordering decision that
    // can affect rank ≤ 5 (and the k = 4 family edges) must be decided
    // by a gap ≫ double noise, or by bit-identical vectors (where both
    // engines tie and break by neighbor id identically).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val rows = Tables.embeddings(spark, dir)
        .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def unit(v: Array[Double]): Array[Double] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
      val us = rows.map { case (i, v) => (i, unit(v)) }
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      us.foreach { case (qi, qv) =>
        val top = us.filter(_._1 != qi)
          .map { case (ni, nv) => (dot(qv, nv), ni, nv) }
          .sortBy { case (sc, ni, _) => (-sc, ni) }
          .take(7)
        top.sliding(2).foreach { pair =>
          val (s1, _, v1) = pair(0)
          val (s2, _, v2) = pair(1)
          assert(s1 - s2 > 1e-9 || java.util.Arrays.equals(v1, v2),
            s"near-tie at query $qi in $dir: $s1 vs $s2")
        }
      }
    }
  }

  test("semanticFamilies: mutual edges only, min-id labels, hubs excluded") {
    // 0-1 reciprocate, 2 points at 1 but 1 does not reciprocate at k=1;
    // 3-4 an isolated reciprocal pair; 5 far from everything
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.14f, 0.0f)),
      (2L, Array(0.9f, 0.43f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.99f, 0.14f)),
      (5L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val fams = Similarity.semanticFamilies(vecs, "embedding", "vec_id", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fams == Map(0L -> 0L, 1L -> 0L, 3L -> 3L, 4L -> 3L),
      fams.toSeq.sortBy(_._1).mkString(","))
  }
}
