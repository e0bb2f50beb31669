package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  lazy val events = Tables.events(spark, dir)

  test("stream-static enrichment: dim segments join in, unmatched fill unknown") {
    import spark.implicits._
    val dim = events.select("user_id").distinct().limit(5)
      .withColumn("segment", lit("member"))
    val out = EventStream.enrichedCounts(events, dim).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum == events.count())
    val segs = out.map(_.getAs[String]("segment")).toSet
    assert(segs.contains("member") && segs.contains("unknown"))
  }

  test("tumbling window counts: batch totals partition the events") {
    val out = EventStream.tumblingCounts(events).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum == events.count())
    // windows are epoch-aligned hours
    out.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("window_start")
      assert(ts.getTime % (3600 * 1000) == 0)
    }
  }

  test("sliding windows double-count by design (1h window, 30min slide)") {
    val tumble = EventStream.tumblingCounts(events).agg(sum("n_events")).collect()(0).getLong(0)
    val slide = EventStream.slidingCounts(events).agg(sum("n_events")).collect()(0).getLong(0)
    assert(slide == 2 * tumble)
  }

  test("dedup drops duplicate event ids") {
    val doubled = events.union(events)
    assert(EventStream.dedupEvents(doubled).count() == events.count())
  }

  test("session windows: per-user sessions respect the 30-minute gap") {
    val sessions = EventStream.sessionize(events).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == events.count())
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        // next session starts at least 30min after the previous ends
        assert(b.getAs[java.sql.Timestamp]("session_start").getTime >=
          a.getAs[java.sql.Timestamp]("session_end").getTime)
      }
    }
  }

  test("flatMapGroupsWithState running totals cover every user") {
    val out = EventStream.runningUserTotals(spark, events).collect()
    val users = events.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("user_id")).distinct.length == users)
    val totalN = out.map(_.getAs[Long]("n")).sum
    assert(totalN == events.count()) // single batch: one state emission per user
  }

  test("running totals evict idle users via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 360000L * 60000 // epoch-aligned base instant
    def ev(id: Long, min: Long, uid: Long, v: Double) =
      EventStream.Ev(id, new java.sql.Timestamp(base + min * 60000), uid, "a",
        java.math.BigDecimal.valueOf(v))
    val ms = MemoryStream[EventStream.Ev]
    val q = EventStream.runningUserTotals(spark, ms.toDF())
      .writeStream.outputMode("append").format("memory").queryName("running_totals")
      .start()
    try {
      // b1: both users at t=0; watermark after b1 = t-10min
      ms.addData(ev(1, 0, 1, 1.0), ev(2, 0, 2, 1.0)); q.processAllAvailable()
      // b2: user2 at t=120 → watermark advances to t=110 AFTER this batch
      ms.addData(ev(3, 120, 2, 1.0)); q.processAllAvailable()
      // b3 runs with watermark 110 > user1's timeout (0+30) → state evicted
      ms.addData(ev(4, 150, 2, 1.0)); q.processAllAvailable()
      // b4: user1 returns — must restart from zero, proving eviction
      ms.addData(ev(5, 160, 1, 5.0)); q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM running_totals").collect()
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1)
        .map(r => (r.getAs[Long]("n"), r.getAs[Double]("total"))).toSet
      assert(u1.contains((1L, 1.0)))
      assert(u1.contains((1L, 5.0)), s"state must restart after eviction, got $u1")
      assert(!u1.contains((2L, 6.0)), "evicted state must not accumulate")
      // user2 stayed active throughout — never evicted, keeps accumulating
      val u2max = rows.filter(_.getAs[Long]("user_id") == 2).map(_.getAs[Long]("n")).max
      assert(u2max == 3L)
    } finally q.stop()
  }

  test("incremental near-dup screens a STREAMING probe against a frozen corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val batch = graft.operators.Dedup.nearDupAgainst(probe, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must contain cross-split near-dups")

    // stream the probe through a real file source; every probe-side step
    // is stateless, so the same operator runs unchanged
    val probeDir = java.nio.file.Files.createTempDirectory("neardup_probe").toString
    probe.write.mode("overwrite").parquet(probeDir)
    val probeStream = spark.readStream.schema(probe.schema).parquet(probeDir)
    assert(probeStream.isStreaming)
    val q = graft.operators.Dedup
      .nearDupAgainst(probeStream, corpus, "text", "doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT probe_id, corpus_id FROM neardup_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("incremental span scrub distributes over micro-batches (foreachBatch-composable)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    def scrub(p: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.duplicateSpanScrubAgainst(p, corpus, "text", "doc_id", n = 5)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val whole = scrub(probe)
    assert(whole.exists(_._3 > 0), "fixture must contain cross-split duplicated spans")
    // per-probe-doc independence given a frozen corpus: any batch split
    // yields the same union — the property foreachBatch ingestion needs
    val half1 = scrub(probe.where(pmod(col("doc_id"), lit(2)) === 0))
    val half2 = scrub(probe.where(pmod(col("doc_id"), lit(2)) === 1))
    assert((half1 ++ half2) == whole)
  }

  test("containment screen distributes over micro-batches (foreachBatch-composable)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("text").isNotNull)
    // probe = derived snippets (guaranteed containment hits), corpus = docs
    val toks = graft.functions.TextFunctions.tokens(
      graft.functions.TextFunctions.normalizeText(col("text")))
    val probe = docs.where(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1),
          floor((size(toks) + lit(2)) / 3).cast("int"))).as("text"))
    def screen(p: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.containedAgainst(p, docs, "text", "doc_id", n = 3, tau = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = screen(probe)
    assert(whole.nonEmpty, "snippets must be contained in their sources")
    // per-probe-row independence given a frozen corpus: any micro-batch
    // split yields the same union — corpus-side document frequencies
    // (the prefix rarity order) do not depend on the probe batch
    val half1 = screen(probe.where(pmod(col("doc_id"), lit(2)) === 0))
    val half2 = screen(probe.where(pmod(col("doc_id"), lit(2)) === 1))
    assert((half1 ++ half2) == whole)
  }

  test("streaming curation screen: multi-batch union equals one-shot batch screening") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    // frozen corpus vs arriving probe: same split as q_dedup_incremental
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)

    val batchAdmitted = graft.streaming.CurationStream
      .screen(probe, corpus, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchAdmitted.nonEmpty, "fixture must admit some documents")
    assert(batchAdmitted.size < probe.count(), "fixture must also reject some")

    // stream the probe as FOUR files, one per micro-batch, so the
    // per-batch screening path genuinely runs more than once
    val dir = java.nio.file.Files.createTempDirectory("curation_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    assert(stream.isStreaming)

    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation_ck").toString
    val q = graft.streaming.CurationStream.startScreen(
      stream, corpus, evalSet,
      sink = out => {
        batches += 1
        out.select("doc_id").collect().foreach(r => admitted.add(r.getLong(0)))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == batchAdmitted,
        s"streamed ${admitted.size} admissions, batch ${batchAdmitted.size}")
    } finally q.stop()
  }

  test("indexed streaming screen (prebuilt LshIndex): equals the ad-hoc screen; multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val index = graft.operators.LshIndex.build(corpus, "text", "doc_id")

    // the index path admits exactly what the ad-hoc corpus path admits
    val adHoc = graft.streaming.CurationStream
      .screen(probe, corpus, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = graft.streaming.CurationStream
      .screenIndexed(probe, index, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(oneShot == adHoc)
    assert(oneShot.nonEmpty && oneShot.size < probe.count())

    // and the v2 indexed chain equals the ad-hoc v2 chain
    val v2AdHoc = graft.streaming.CurationStream
      .screenV2(probe, corpus, evalSet, spanN = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    val v2Indexed = graft.streaming.CurationStream
      .screenV2Indexed(probe, index, corpus, evalSet, spanN = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(v2Indexed == v2AdHoc)

    // streamed per-batch probing of the SAME prebuilt index unions to
    // the one-shot admission set
    val dir = java.nio.file.Files.createTempDirectory("curationidx_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curationidx_ck").toString
    val q = graft.streaming.CurationStream.startScreenIndexed(
      stream, index, evalSet,
      sink = out => {
        batches += 1
        out.select("doc_id").collect().foreach(r => admitted.add(r.getLong(0)))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("v2 indexed streaming screen: multi-batch union equals the one-shot v2 screen") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val index = graft.operators.LshIndex.build(corpus, "text", "doc_id")

    val oneShot = graft.streaming.CurationStream
      .screenV2(probe, corpus, evalSet, spanN = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(oneShot.nonEmpty && oneShot.exists(_._3 > 0))

    val dir = java.nio.file.Files.createTempDirectory("curation2idx_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String, Int), java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation2idx_ck").toString
    val q = graft.streaming.CurationStream.startScreenV2Indexed(
      stream, index, corpus, evalSet, spanN = 5,
      sink = out => {
        batches += 1
        out.collect().foreach(r => admitted.add((r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("n_tokens_removed"))))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("semantic screen (LshIndex + embedding IvfIndex): lexical minus exact embedding near-dups at full probe; multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    // a probe/corpus that carries BOTH modalities
    val multi = docs.join(embs, Seq("doc_id"))
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = multi.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val lshIdx = graft.operators.LshIndex.build(corpus, "text", "doc_id")
    val embIdx = graft.operators.Similarity.IvfIndex.build(
      corpus, "embedding", "doc_id", nlist = 8)

    // embNprobe = nlist ⇒ the semantic stage is EXACT: admissions equal
    // the lexical screen minus docs with any true cosine ≥ t in corpus
    val lexical = graft.streaming.CurationStream
      .screenIndexed(probe, lshIdx, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = graft.streaming.CurationStream
      .screenSemantic(probe, lshIdx, embIdx, evalSet,
        embThreshold = 0.4, embNprobe = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val u = graft.operators.Similarity.withUnitVec(multi, "embedding", "__u")
      .select(col("doc_id"), col("__u"))
    graft.plans.GraftExtensions.register(spark)
    val semDup = u.filter(pmod(col("doc_id"), lit(31)) =!= 0 &&
        pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id"), col("__u").as("__p"))
      .crossJoin(u.filter(pmod(col("doc_id"), lit(31)) =!= 0 &&
          pmod(col("doc_id"), lit(7)) =!= 0)
        .select(col("doc_id").as("cid"), col("__u").as("__c")))
      .where(graft.plans.GraftExtensions.dotArr(col("__p"), col("__c")) >= 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(oneShot == lexical -- semDup,
      s"semantic=${oneShot.size} lexical=${lexical.size} semDup=${semDup.size}")
    assert((lexical -- oneShot).nonEmpty,
      "fixture must exercise the semantic gate (no doc was dropped)")

    // streamed multi-batch union == one-shot
    val dir = java.nio.file.Files.createTempDirectory("semscreen_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("semscreen_ck").toString
    val q = graft.streaming.CurationStream.startScreenSemantic(
      stream, lshIdx, embIdx, evalSet,
      sink = out => {
        batches += 1
        out.select("doc_id").collect().foreach(r => admitted.add(r.getLong(0)))
      },
      embThreshold = 0.4, embNprobe = 8,
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("FULLY-indexed v2 screen (LshIndex + SpanIndex, no raw corpus): equals screenV2; multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val index = graft.operators.LshIndex.build(corpus, "text", "doc_id")
    // the span stage served by a SAVED-then-LOADED SpanIndex: the
    // fully-indexed screen touches no raw corpus frame at all
    val spanDir = java.nio.file.Files.createTempDirectory("curation2span_idx").toString
    graft.operators.SpanIndex.build(corpus, "text", n = 5).save(spanDir)
    val spanIndex = graft.operators.SpanIndex.load(spark, spanDir)

    val oneShot = graft.streaming.CurationStream
      .screenV2(probe, corpus, evalSet, spanN = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(oneShot.nonEmpty && oneShot.exists(_._3 > 0))
    val fullyIndexed = graft.streaming.CurationStream
      .screenV2FullyIndexed(probe, index, spanIndex, evalSet)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(fullyIndexed == oneShot)
    // the aggregate-free span stage: a SpanIndex saved WITH a persisted
    // Bloom filter serves the screen's Bloom branch from the saved
    // bytes; at fpp 1e-8 the admissions equal the exact path
    val bloomDir = java.nio.file.Files.createTempDirectory("curation2span_bloom").toString
    graft.operators.SpanIndex.build(corpus, "text", n = 5).save(bloomDir, bloomFpp = 1e-8)
    val bloomIndex = graft.operators.SpanIndex.load(spark, bloomDir)
    assert(bloomIndex.bloom.nonEmpty)
    val viaBloom = graft.streaming.CurationStream
      .screenV2FullyIndexed(probe, index, bloomIndex, evalSet, spanBloomFpp = 1e-8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(viaBloom == oneShot)

    val dir = java.nio.file.Files.createTempDirectory("curation2full_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String, Int), java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation2full_ck").toString
    val q = graft.streaming.CurationStream.startScreenV2FullyIndexed(
      stream, index, spanIndex, evalSet,
      sink = out => {
        batches += 1
        out.collect().foreach(r => admitted.add((r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("n_tokens_removed"))))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("ALL-indexed screens (LshIndex + SpanIndex + EvalIndex, no raw corpus OR eval frame): equal raw forms; multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val index = graft.operators.LshIndex.build(corpus, "text", "doc_id")
    val spanIndex = graft.operators.SpanIndex.build(corpus, "text", n = 5)
    // the eval stage served by a SAVED-then-LOADED EvalIndex with a
    // persisted Bloom filter: no raw eval frame in any plan, and the
    // Bloom branch runs aggregate-free from the saved bytes
    val evalDir = java.nio.file.Files.createTempDirectory("curation_evalidx").toString
    graft.operators.EvalIndex.build(evalSet, "text", n = 5).save(evalDir, bloomFpp = 1e-8)
    val evalIndex = graft.operators.EvalIndex.load(spark, evalDir)
    assert(evalIndex.bloom.nonEmpty)

    // v1: screenAllIndexed == screen
    val v1 = graft.streaming.CurationStream.screen(probe, corpus, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(v1.nonEmpty)
    assert(graft.streaming.CurationStream
      .screenAllIndexed(probe, index, evalIndex)
      .select("doc_id").collect().map(_.getLong(0)).toSet == v1)

    // v2: screenV2AllIndexed == screenV2, exact and Bloom-served eval
    val oneShot = graft.streaming.CurationStream
      .screenV2(probe, corpus, evalSet, spanN = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(oneShot.nonEmpty)
    val allIndexed = graft.streaming.CurationStream
      .screenV2AllIndexed(probe, index, spanIndex, evalIndex)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(allIndexed == oneShot)
    val viaBloom = graft.streaming.CurationStream
      .screenV2AllIndexed(probe, index, spanIndex, evalIndex,
        evalBloomFpp = 1e-8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(viaBloom == oneShot)

    val dir = java.nio.file.Files.createTempDirectory("curation_allidx_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String, Int), java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation_allidx_ck").toString
    val q = graft.streaming.CurationStream.startScreenV2AllIndexed(
      stream, index, spanIndex, evalIndex,
      sink = out => {
        batches += 1
        out.collect().foreach(r => admitted.add((r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("n_tokens_removed"))))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("model-based quality gate in the screen chain: multi-batch union equals one-shot; gate actually prunes") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val index = graft.operators.LshIndex.build(corpus, "text", "doc_id")
    val spanIndex = graft.operators.SpanIndex.build(corpus, "text", n = 5)
    // fit the FineWeb-style classifier stage on the frozen corpus
    val model = graft.operators.QualityClassifier.fit(
      corpus.withColumn("label",
        (graft.functions.TextFunctions.tokenCount(col("text")) >= 40).cast("int")),
      "text", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet

    val without = rows(graft.streaming.CurationStream
      .screenV2FullyIndexed(probe, index, spanIndex, evalSet))
    val oneShot = rows(graft.streaming.CurationStream
      .screenV2FullyIndexed(probe, index, spanIndex, evalSet,
        model = Some(model), minModelScore = 0.5))
    // the model gate must do real work on this corpus (a vacuous gate
    // would make the distributivity assertion below prove nothing) and
    // only ever prune
    assert(oneShot.nonEmpty && oneShot.size < without.size,
      s"model gate pruned ${without.size} -> ${oneShot.size}")
    assert(oneShot.subsetOf(without))

    val dir = java.nio.file.Files.createTempDirectory("curation_mq_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String, Int), java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation_mq_ck").toString
    val q = graft.streaming.CurationStream.startScreenV2FullyIndexed(
      stream, index, spanIndex, evalSet,
      sink = out => {
        batches += 1
        out.collect().foreach(r => admitted.add((r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("n_tokens_removed"))))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      model = Some(model), minModelScore = 0.5)
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("extraGate in the screen chain (Gopher rules): prunes and only prunes; multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val index = graft.operators.LshIndex.build(corpus, "text", "doc_id")
    val spanIndex = graft.operators.SpanIndex.build(corpus, "text", n = 5)
    // an arbitrary stateless rule rides the gate conjunction — here the
    // Gopher composition rules tuned so they split this corpus
    val gate = graft.functions.TextFunctions.gopherRules(col("text"),
      minWords = 40, stopWords = Seq("the", "a"), minStopHits = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    val without = rows(graft.streaming.CurationStream
      .screenV2FullyIndexed(probe, index, spanIndex, evalSet))
    val oneShot = rows(graft.streaming.CurationStream
      .screenV2FullyIndexed(probe, index, spanIndex, evalSet,
        extraGate = Some(gate)))
    assert(oneShot.nonEmpty && oneShot.size < without.size,
      s"extra gate pruned ${without.size} -> ${oneShot.size}")
    assert(oneShot.subsetOf(without))

    val dir = java.nio.file.Files.createTempDirectory("curation_xg_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String, Int), java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation_xg_ck").toString
    val q = graft.streaming.CurationStream.startScreenV2FullyIndexed(
      stream, index, spanIndex, evalSet,
      sink = out => {
        batches += 1
        out.collect().foreach(r => admitted.add((r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("n_tokens_removed"))))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      extraGate = Some(gate))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, one-shot ${oneShot.size}")
    } finally q.stop()
  }

  test("v2 streaming screen (span scrub in the chain): multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)

    // spanN = 5 matches the proven-distributivity setting; the one-shot
    // reference must actually scrub something for the test to bite
    val oneShot = graft.streaming.CurationStream
      .screenV2(probe, corpus, evalSet, spanN = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Int]("n_tokens_removed"))).toSet
    assert(oneShot.nonEmpty, "fixture must admit some documents")
    assert(oneShot.exists(_._3 > 0), "fixture must scrub spans from an admitted doc")

    val dir = java.nio.file.Files.createTempDirectory("curation2_probe").toString
    probe.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String, Int), java.lang.Boolean]())
    var batches = 0
    val ck = java.nio.file.Files.createTempDirectory("curation2_ck").toString
    val q = graft.streaming.CurationStream.startScreenV2(
      stream, corpus, evalSet, spanN = 5,
      sink = out => {
        batches += 1
        out.collect().foreach(r => admitted.add((r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("n_tokens_removed"))))
      },
      checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(batches > 1, s"expected multiple micro-batches, got $batches")
      assert(admitted.asScala.toSet == oneShot,
        s"streamed ${admitted.size} admissions, batch ${oneShot.size}")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch result") {
    // batch reference
    val batch = EventStream.attributedPurchases(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture must contain click->purchase attributions")

    // genuine two-stream join: both sides are filtered views of the same
    // file-source stream, watermarked, with an event-time range predicate
    // (the planner requires exactly this shape for bounded join state)
    val src = EventStream.readStream(spark, dir)
    assert(src.isStreaming)
    val q = EventStream.attributedPurchases(src, watermarked = true)
      .writeStream.outputMode("append")
      .format("memory").queryName("join_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT user_id, click_id, purchase_id FROM join_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // inner join + AvailableNow: every pair inside the watermark emits;
      // pairs whose click arrived after the final watermark cannot be
      // dropped here because AvailableNow drains everything before the
      // final watermark advances — so the streamed set must EQUAL batch
      assert(streamed == batch,
        s"streamed ${streamed.size} pairs, batch ${batch.size}")
    } finally q.stop()
  }

  test("end-to-end streaming query: file source -> watermark -> memory sink") {
    val q = EventStream.startTumblingQuery(spark, dir, "stream_out")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM stream_out")
      // AvailableNow + watermark: all windows older than max(ts)-10min close;
      // compare those against the batch result
      val batch = EventStream.tumblingCounts(events)
      val streamedRows = streamed.collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getString(1), r.getLong(2))).toSet
      val batchRows = batch.collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getString(1), r.getLong(2))).toSet
      assert(streamedRows.nonEmpty)
      assert(streamedRows.subsetOf(batchRows), "streamed closed windows must equal batch values")
    } finally q.stop()
  }

  test("startTokenizedExport: multi-batch binary export reads back every doc exactly once; replay is idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Int])]
    val dir = java.nio.file.Files.createTempDirectory("tokstream").toString
    val ck = java.nio.file.Files.createTempDirectory("tokstream_ck").toString
    // AvailableNow snapshots availability at START: data must be added
    // BEFORE each query starts for it to land in that query's batches
    ms.addData((1L, Seq(1, 2)), (2L, Seq(3)))
    val q = graft.streaming.CurationStream.startTokenizedExport(
      ms.toDF().toDF("doc_id", "token_ids"), dir, vocabSize = 64,
      shardsPerBatch = 2, checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.processAllAvailable(); q.stop()
    ms.addData((10L, Seq(7, 8)), (11L, Seq(9)))
    val q2 = graft.streaming.CurationStream.startTokenizedExport(
      ms.toDF().toDF("doc_id", "token_ids"), dir, vocabSize = 64,
      shardsPerBatch = 2, checkpointDir = ck,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.processAllAvailable(); q2.stop()
    val got = graft.sources.TokenizedExport.read(spark, dir)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    assert(got == Map(1L -> Seq(1, 2), 2L -> Seq(3), 10L -> Seq(7, 8), 11L -> Seq(9)))
    // shard numbers are batchId-deterministic: batch b owns [2b, 2b+2)
    val byDoc = graft.sources.TokenizedExport.read(spark, dir)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L).forall(byDoc(_) < 2), byDoc.toString)
    assert(Seq(10L, 11L).forall(d => byDoc(d) >= 2 && byDoc(d) < 4), byDoc.toString)
    // a REPLAYED batch (same batchId -> same shardOffset) rewrites its
    // own files byte-identically: simulate by re-writing batch 0's rows
    // at its offset and comparing bytes
    val before = (0 until 2).map { k =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, s"shard-$k.bin")).toSeq
    }
    (0 until 2).foreach { k =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, s".shard-$k.bin.crc"))
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, s".shard-$k.idx.crc"))
    }
    graft.sources.TokenizedExport.write(
      Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("doc_id", "token_ids"),
      "doc_id", "token_ids", dir, 2, 64, shardOffset = 0L).count()
    val after = (0 until 2).map { k =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, s"shard-$k.bin")).toSeq
    }
    assert(after == before, "replaying a batch at its own offset must be byte-idempotent")
  }

  test("WebDataset streaming screen: shards in, curated docs out; multi-batch union equals one-shot") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tar
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.where(pmod(col("doc_id"), lit(31)) === 0)
    val rest = docs.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val probe = rest.where(pmod(col("doc_id"), lit(7)) === 0 && col("text").isNotNull)
    val corpus = rest.where(pmod(col("doc_id"), lit(7)) =!= 0)

    val batchAdmitted = graft.streaming.CurationStream
      .screen(probe.select("doc_id", "text"), corpus, evalSet)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchAdmitted.nonEmpty)

    // serialize the probe as THREE WebDataset shards (txt + cls parts)
    val dir = java.nio.file.Files.createTempDirectory("wds_stream").toString
    val rows = probe.select("doc_id", "lang", "text").collect()
    rows.grouped(math.max(1, rows.length / 3 + 1)).zipWithIndex.foreach {
      case (grp, i) =>
        val entries = grp.toSeq.flatMap { r =>
          Seq((f"${r.getLong(0)}%012d.txt", r.getString(2).getBytes("UTF-8")),
            (f"${r.getLong(0)}%012d.cls", r.getString(1).getBytes("UTF-8")))
        }
        val gz = new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(new java.io.File(dir, f"shard_$i%03d.tar.gz")))
        gz.write(Tar.recordBytes(entries)); gz.close()
    }

    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    val ck = java.nio.file.Files.createTempDirectory("wds_ck").toString
    // doc_id is now xxhash64(shard, sample_key) — synthetic, so the
    // one-shot comparison goes through the carried sample_key (the
    // zero-padded original id); the hashed ids must still be distinct
    // and non-null (the failure mode of the old cast("long") id was
    // silent nulls on non-numeric keys)
    val hashedIds = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    val q = graft.streaming.CurationStream.startScreenWebdataset(
      spark, dir, corpus, evalSet,
      sink = out => out.select(col("sample_key").cast("long"), col("doc_id"))
        .collect().foreach { r =>
          assert(!r.isNullAt(1), "hashed doc_id must never be null")
          admitted.add(r.getLong(0)); hashedIds.add(r.getLong(1))
        },
      checkpointDir = ck)
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(admitted.asScala.toSet == batchAdmitted,
        s"streamed ${admitted.size} admissions, batch ${batchAdmitted.size}")
      assert(hashedIds.size == admitted.size,
        "xxhash64(shard, sample_key) ids must be distinct per admitted sample")
    } finally q.stop()
  }
}
