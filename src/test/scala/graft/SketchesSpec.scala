package graft

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** n distinct synthetic values tagged with a group. */
  private def vals(g: String, n: Int, salt: String = ""): DataFrame =
    spark.range(n).select(lit(g).as("g"),
      concat(lit(s"v$salt-"), col("id")).as("v"))

  test("h60 matches the md5-derived constant both engines compute") {
    // md5('hello') = 5d41402abc4b2a76..., first 15 hex = 419982666956583591
    // (verified against DuckDB's ('0x'||substr(md5(v),1,15))::BIGINT)
    val h = Seq("hello").toDF("v").select(Sketches.h60(col("v"))).head.getLong(0)
    assert(h == 419982666956583591L)
  }

  test("HLL estimate lands within the published error band across scales") {
    for (n <- Seq(1000, 20000)) {
      val regs = Sketches.hllRegisters(vals("a", n), "v", Seq("g"), p = 10)
      val est = Sketches.hllEstimate(regs, Seq("g"), p = 10)
        .head.getAs[Double]("n_distinct_est")
      // stderr ~1.04/sqrt(1024) = 3.25%; 4 sigma = 13%
      assert(math.abs(est - n) / n < 0.13, s"n=$n est=$est")
    }
  }

  test("HLL small-range linear counting is near exact") {
    val regs = Sketches.hllRegisters(vals("a", 40), "v", Seq("g"), p = 10)
    val row = Sketches.hllEstimate(regs, Seq("g"), p = 10).head
    val est = row.getAs[Double]("n_distinct_est")
    assert(row.getAs[Long]("v_zero") > 0)
    assert(math.abs(est - 40) / 40 < 0.05, s"est=$est")
  }

  test("HLL merge law: registers(A union B) == merge(registers(A), registers(B))") {
    val a = vals("g1", 500)
    val b = vals("g1", 700, salt = "x") // overlaps nothing with a
    val direct = Sketches.hllRegisters(a.union(b), "v", Seq("g"), p = 8)
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, "v", Seq("g"), p = 8),
      Sketches.hllRegisters(b, "v", Seq("g"), p = 8), Seq("g"))
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty)
  }

  test("HLL registers are partitioning-invariant (deterministic)") {
    val d = vals("a", 3000)
    val r1 = Sketches.hllRegisters(d.repartition(1), "v", Seq("g")).collect().toSet
    val r32 = Sketches.hllRegisters(d.repartition(32), "v", Seq("g")).collect().toSet
    assert(r1 == r32)
  }

  test("KMV is exact under k, estimates over k, and duplicates never inflate") {
    val small = vals("a", 50)
    val sigSmall = Sketches.kmvSketch(small.union(small), "v", Seq("g"), k = 64)
    val estSmall = sigSmall.select(Sketches.kmvEstimateCol(col("kmv_sig"), 64))
      .head.getDouble(0)
    assert(estSmall == 50.0, s"under-k KMV must be exact, got $estSmall")

    val big = vals("a", 5000)
    val est = Sketches.kmvSketch(big, "v", Seq("g"), k = 256)
      .select(Sketches.kmvEstimateCol(col("kmv_sig"), 256)).head.getDouble(0)
    // stderr ~1/sqrt(k-2) = 6.3%; 4 sigma = 25%
    assert(math.abs(est - 5000) / 5000 < 0.25, s"est=$est")
  }

  test("KMV merge law and partitioning invariance") {
    val a = vals("g1", 800)
    val b = vals("g1", 900, salt = "x")
    val k = 128
    val sigA = Sketches.kmvSketch(a, "v", Seq("g"), k).head.getSeq[Long](1)
    val sigB = Sketches.kmvSketch(b, "v", Seq("g"), k).head.getSeq[Long](1)
    val direct = Sketches.kmvSketch(a.union(b).repartition(32), "v", Seq("g"), k)
      .head.getSeq[Long](1)
    val merged = Seq((sigA, sigB)).toDF("sa", "sb")
      .select(Sketches.kmvMergeCol(col("sa"), col("sb"), k)).head.getSeq[Long](0)
    assert(direct == merged)
  }

  test("KMV Jaccard tracks the true overlap") {
    // A = 0..1999, B = 1000..2999 -> true J = 1000/3000 = 0.333
    val a = spark.range(2000).select(lit("a").as("g"), concat(lit("j-"), col("id")).as("v"))
    val b = spark.range(1000, 3000).select(lit("b").as("g"), concat(lit("j-"), col("id")).as("v"))
    val k = 256
    val sigs = Sketches.kmvSketch(a.union(b), "v", Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val j = Seq((sigs("a"), sigs("b"))).toDF("sa", "sb")
      .select(Sketches.kmvJaccardCol(col("sa"), col("sb"), k)).head.getDouble(0)
    assert(math.abs(j - 1.0 / 3) < 0.12, s"j=$j")
  }

  test("KMV containment is asymmetric, tracks truth, and is exact below capacity") {
    // A = 0..399 (small), B = 0..199 ∪ 2000..3799 (big): true
    // C(A→B) = 200/400 = 0.5, C(B→A) = 200/2000 = 0.1 — the directional
    // split Jaccard (200/4200 ≈ 0.048) collapses to one number.
    val a = spark.range(400).select(lit("a").as("g"), concat(lit("c-"), col("id")).as("v"))
    val b = spark.range(200).union(spark.range(2000, 3800))
      .select(lit("b").as("g"), concat(lit("c-"), col("id")).as("v"))
    val k = 256
    val sigs = Sketches.kmvSketch(a.union(b), "v", Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val row = Seq((sigs("a"), sigs("b"))).toDF("sa", "sb")
      .select(
        Sketches.kmvContainmentCol(col("sa"), col("sb"), k).as("ab"),
        Sketches.kmvContainmentCol(col("sb"), col("sa"), k).as("ba"))
      .head
    assert(math.abs(row.getDouble(0) - 0.5) < 0.15, s"C(A->B)=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 0.1) < 0.06, s"C(B->A)=${row.getDouble(1)}")
    assert(row.getDouble(0) > row.getDouble(1) * 3, "asymmetry lost")

    // below capacity both sketches hold every hash: the estimate is the
    // EXACT containment up to the two 1e-4 roundings
    val sa = spark.range(40).select(lit("a").as("g"), concat(lit("e-"), col("id")).as("v"))
    val sb = spark.range(20, 120).select(lit("b").as("g"), concat(lit("e-"), col("id")).as("v"))
    val ss = Sketches.kmvSketch(sa.union(sb), "v", Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val exact = Seq((ss("a"), ss("b"))).toDF("sa", "sb")
      .select(Sketches.kmvContainmentCol(col("sa"), col("sb"), k)).head.getDouble(0)
    assert(exact == 0.5, s"below-capacity containment $exact != 20/40")

    // empty-A guard: 0.0, not NaN
    val z = Seq((Seq.empty[Long], ss("b"))).toDF("sa", "sb")
      .select(Sketches.kmvContainmentCol(col("sa"), col("sb"), k)).head.getDouble(0)
    assert(z == 0.0)
  }

  test("CMS never undercounts, is exact for isolated heavy hitters, and merges linearly") {
    // zipf-ish: value i appears (50 - i) times for i in 0..49
    val d = spark.range(50).select(col("id"),
      explode(sequence(lit(1L), lit(50) - col("id"))).as("rep"))
      .select(concat(lit("w-"), col("id")).as("v"))
    val counters = Sketches.cmsCounters(d, "v", depth = 4, widthPow = 10)
    val exact = d.groupBy("v").agg(count(lit(1)).as("n"))
    val est = Sketches.cmsQuery(counters, exact, "v", depth = 4, widthPow = 10)
      .collect()
    est.foreach { r =>
      val (n, e) = (r.getAs[Long]("n"), r.getAs[Long]("cms_est"))
      assert(e >= n, s"CMS undercounted ${r.getString(0)}: $e < $n")
      // 50 distinct values in 4x1024 counters: collisions essentially nil
      assert(e == n, s"unexpected collision for ${r.getString(0)}: $e != $n")
    }
    // linearity: counters(A ++ A) == merge(counters(A), counters(A))
    val doubled = Sketches.cmsCounters(d.union(d), "v", depth = 4, widthPow = 10)
    val merged = Sketches.cmsMerge(counters, counters)
    assert(doubled.exceptAll(merged).isEmpty && merged.exceptAll(doubled).isEmpty)
  }

  test("CMS counters are partitioning-invariant") {
    val d = vals("a", 2000)
    val c1 = Sketches.cmsCounters(d.repartition(1), "v").collect().toSet
    val c32 = Sketches.cmsCounters(d.repartition(32), "v").collect().toSet
    assert(c1 == c32)
  }

  test("HllStore: save/load round-trip, idempotent add, geometry-mismatch loud") {
    val dir = java.nio.file.Files.createTempDirectory("hll_store").toString
    val d = vals("a", 2000)
    val st = Sketches.HllStore(
      Sketches.hllRegisters(d, "v", Seq("g"), p = 8), 8, Seq("g"))
    st.save(dir)
    val loaded = Sketches.loadHll(spark, dir)
    assert(loaded.p == 8 && loaded.groupCols == Seq("g"))
    assert(loaded.regs.collect().toSet == st.regs.collect().toSet)
    // idempotence: re-adding the same data changes nothing
    val again = loaded.add(d, "v")
    assert(again.regs.collect().toSet == st.regs.collect().toSet)
    // estimates served from the loaded store
    val est = loaded.estimate.head.getAs[Double]("n_distinct_est")
    assert(math.abs(est - 2000) / 2000 < 0.25, s"est=$est")
    // mismatched geometry cannot merge
    val other = Sketches.HllStore(
      Sketches.hllRegisters(d, "v", Seq("g"), p = 10), 10, Seq("g"))
    intercept[IllegalArgumentException](loaded.merge(other))
    // a non-store dir fails loud by meta shape
    val bad = java.nio.file.Files.createTempDirectory("hll_bad").toString
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite").parquet(s"$bad/meta")
    intercept[IllegalArgumentException](Sketches.loadHll(spark, bad))
  }

  test("KmvStore: cross-store merge equals sketch-of-union; disjoint groups survive full-outer") {
    val k = 64
    val a = vals("g1", 500)
    val b = vals("g1", 400, salt = "x").union(vals("g2", 300, salt = "y"))
    val sa = Sketches.KmvStore(Sketches.kmvSketch(a, "v", Seq("g"), k), k, Seq("g"))
    val sb = Sketches.KmvStore(Sketches.kmvSketch(b, "v", Seq("g"), k), k, Seq("g"))
    val merged = sa.merge(sb).sigs.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = Sketches.kmvSketch(a.union(b), "v", Seq("g"), k).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == direct)
    // round-trip with add-idempotence
    val dir = java.nio.file.Files.createTempDirectory("kmv_store").toString
    sa.save(dir)
    val loaded = Sketches.loadKmv(spark, dir)
    assert(loaded.k == k)
    val again = loaded.add(a, "v").sigs.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(again == sa.sigs.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap)
  }

  test("streaming HLL monitor: multi-batch accumulation equals the one-shot sketch") {
    val d = spark.range(3000).select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("g"),
      concat(lit("m-"), col("id")).as("v"))
    val oneShot = Sketches.hllEstimate(
      Sketches.hllRegisters(d, "v", Seq("g"), p = 10), Seq("g"), p = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("n_distinct_est")).toMap

    val srcDir = java.nio.file.Files.createTempDirectory("hll_src").toString
    d.repartition(4).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val storeDir = java.nio.file.Files.createTempDirectory("hll_mon").toString + "/st"
    val ck = java.nio.file.Files.createTempDirectory("hll_ck").toString
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.SketchMonitor.startHllMonitor(
      stream, "v", Seq("g"), storeDir, ck, p = 10,
      onEstimate = _ => batches.incrementAndGet())
    try q.processAllAvailable() finally q.stop()
    assert(batches.get() >= 2, s"wanted multiple micro-batches, got ${batches.get()}")
    val streamed = Sketches.loadHll(spark, storeDir).estimate
      .collect().map(r => r.getString(0) -> r.getAs[Double]("n_distinct_est")).toMap
    assert(streamed == oneShot)
  }

  test("log-histogram bucket math is exact at the boundaries (hand-checked, k=5)") {
    val d = Seq(0L, 1L, 31L, 32L, 33L, 100L, 101L, 1023L, 1024L).toDF("v")
    val got = Sketches.logHistogram(d, "v", Seq.empty, subBits = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // v < 32 -> bucket v; v=100 (msb 6) -> 2*32 + (100>>1 & 31) = 82 (101 shares it)
    assert(got(0L) == 1 && got(1L) == 1 && got(31L) == 1)
    assert(got(32L) == 1 && got(33L) == 1)
    assert(got(82L) == 2, s"100 and 101 must share bucket 82: $got")
    // lower bounds invert exactly
    val lows = Seq(82L, 32L, 5L).toDF("__b")
      .select(Sketches.bucketLow("__b", 5)).collect().map(_.getLong(0))
    assert(lows.toSeq == Seq(100L, 32L, 5L))
  }

  test("log-histogram merge law, determinism, and negative-value loudness") {
    val a = spark.range(1, 5000).select((col("id") * 7 % 9973).as("v"))
    val b = spark.range(1, 3000).select((col("id") * 13 % 9973).as("v"))
    val direct = Sketches.logHistogram(a.union(b), "v", Seq.empty).collect().toSet
    val merged = Sketches.histMerge(
      Sketches.logHistogram(a, "v", Seq.empty),
      Sketches.logHistogram(b, "v", Seq.empty), Seq.empty).collect().toSet
    assert(direct == merged)
    val r1 = Sketches.logHistogram(a.repartition(1), "v", Seq.empty).collect().toSet
    val r32 = Sketches.logHistogram(a.repartition(32), "v", Seq.empty).collect().toSet
    assert(r1 == r32)
    intercept[Exception](
      Sketches.logHistogram(Seq(-1L).toDF("v"), "v", Seq.empty).collect())
  }

  test("log-histogram quantiles: lower-bound property and 2^-k relative error") {
    val k = 5
    val d = spark.range(1, 20001).select(lit("g").as("g"), (col("id") * 17 % 50021).as("v"))
    val hist = Sketches.logHistogram(d, "v", Seq("g"), subBits = k)
    val ps = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val est = Sketches.histQuantiles(hist, Seq("g"), ps, subBits = k)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val n = d.count()
    val sorted = d.select("v").collect().map(_.getLong(0)).sorted
    for ((label, num, den) <- ps) {
      val exact = sorted(((n * num + den - 1) / den - 1).toInt)
      val e = est(label)
      assert(e <= exact, s"$label: estimate $e must lower-bound exact $exact")
      assert(exact <= e + (e >> (k - 1)) + 1,
        s"$label: exact $exact outside the 2^-${k - 1} band of $e")
    }
  }

  test("KMV intersection/difference estimates track truth (theta-style set ops)") {
    // A = 0..1999, B = 1000..2999: |A n B| = 1000, |A \\ B| = 1000
    val a = spark.range(2000).select(lit("a").as("g"), concat(lit("t-"), col("id")).as("v"))
    val b = spark.range(1000, 3000).select(lit("b").as("g"), concat(lit("t-"), col("id")).as("v"))
    val k = 256
    val sigs = Sketches.kmvSketch(a.union(b), "v", Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val row = Seq((sigs("a"), sigs("b"))).toDF("sa", "sb")
      .select(Sketches.kmvIntersectCol(col("sa"), col("sb"), k).as("i"),
        Sketches.kmvDifferenceCol(col("sa"), col("sb"), k).as("d")).head
    assert(math.abs(row.getDouble(0) - 1000) / 1000 < 0.35, s"inter=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 1000) / 1000 < 0.35, s"diff=${row.getDouble(1)}")
    // disjoint sets: intersection estimate is exactly 0
    val c = spark.range(5000, 7000).select(lit("c").as("g"), concat(lit("t-"), col("id")).as("v"))
    val sigC = Sketches.kmvSketch(c, "v", Seq("g"), k).head.getSeq[Long](1)
    val z = Seq((sigs("a"), sigC)).toDF("sa", "sc")
      .select(Sketches.kmvIntersectCol(col("sa"), col("sc"), k)).head.getDouble(0)
    assert(z == 0.0)
  }

  test("streaming KMV monitor: multi-batch accumulation equals the one-shot sketch") {
    val d = spark.range(2500).select(
      concat(lit("s"), pmod(col("id"), lit(2))).as("g"),
      concat(lit("km-"), col("id")).as("v"))
    val k = 128
    val oneShot = Sketches.kmvSketch(d, "v", Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val srcDir = java.nio.file.Files.createTempDirectory("kmv_src").toString
    d.repartition(4).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val storeDir = java.nio.file.Files.createTempDirectory("kmv_mon").toString + "/st"
    val ck = java.nio.file.Files.createTempDirectory("kmv_ck").toString
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.SketchMonitor.startKmvMonitor(
      stream, "v", Seq("g"), storeDir, ck, k = k,
      onSignatures = _ => batches.incrementAndGet())
    try q.processAllAvailable() finally q.stop()
    assert(batches.get() >= 2, s"wanted multiple micro-batches, got ${batches.get()}")
    val streamed = Sketches.loadKmv(spark, storeDir).sigs
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(streamed == oneShot)
  }

  test("streaming CMS monitor: versioned commits make sum-merge exactly-once") {
    val d = spark.range(3000).select(concat(lit("c-"), pmod(col("id"), lit(40))).as("v"))
    val oneShot = Sketches.cmsCounters(d, "v").collect().toSet

    val srcDir = java.nio.file.Files.createTempDirectory("cms_src").toString
    d.repartition(4).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val storeDir = java.nio.file.Files.createTempDirectory("cms_mon").toString + "/st"
    val ck = java.nio.file.Files.createTempDirectory("cms_ck").toString
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.SketchMonitor.startCmsMonitor(
      stream, "v", storeDir, ck, onCounters = _ => batches.incrementAndGet())
    try q.processAllAvailable() finally q.stop()
    assert(batches.get() >= 2)
    val latest = graft.streaming.SketchMonitor.latestVersion(spark, storeDir).get
    assert(spark.read.parquet(latest).collect().toSet == oneShot)

    // REPLAY of an already-committed batch id is a no-op (the failure
    // mode that double-counts a sum-merged sketch without the ledger)
    val before = spark.read.parquet(
      graft.streaming.SketchMonitor.latestVersion(spark, storeDir).get).collect().toSet
    val lastId = new java.io.File(storeDir).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toLong).max
    val applied = graft.streaming.SketchMonitor.commitSumVersion(
      spark, storeDir, lastId, 3,
      prev => Sketches.cmsMerge(prev.get, Sketches.cmsCounters(d, "v")))
    assert(!applied, "a committed version must be skipped")
    val after = spark.read.parquet(
      graft.streaming.SketchMonitor.latestVersion(spark, storeDir).get).collect().toSet
    assert(after == before)
    // old versions pruned to keepVersions
    val versions = new java.io.File(storeDir).listFiles()
      .map(_.getName).count(_.matches("v\\d+"))
    assert(versions <= 3, s"$versions versions kept")
  }

  test("streaming histogram monitor accumulates to the one-shot sketch") {
    val d = spark.range(1, 4000).select(lit("g").as("g"), (col("id") * 13 % 9973).as("v"))
    val oneShot = Sketches.logHistogram(d, "v", Seq("g")).collect().toSet
    val srcDir = java.nio.file.Files.createTempDirectory("hist_src").toString
    d.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val storeDir = java.nio.file.Files.createTempDirectory("hist_mon").toString + "/st"
    val ck = java.nio.file.Files.createTempDirectory("hist_ck").toString
    val q = graft.streaming.SketchMonitor.startHistMonitor(
      stream, "v", Seq("g"), storeDir, ck)
    try q.processAllAvailable() finally q.stop()
    val latest = graft.streaming.SketchMonitor.latestVersion(spark, storeDir).get
    assert(spark.read.parquet(latest).collect().toSet == oneShot)
  }

  test("CmsStore and HistStore: round-trips, merge == sketch-of-concat, geometry loud") {
    val a = spark.range(2000).select(concat(lit("s-"), pmod(col("id"), lit(30))).as("v"))
    val b = spark.range(500).select(concat(lit("s-"), pmod(col("id"), lit(50))).as("v"))
    val ca = Sketches.CmsStore(Sketches.cmsCounters(a, "v"), 4, 10)
    val cb = Sketches.CmsStore(Sketches.cmsCounters(b, "v"), 4, 10)
    val direct = Sketches.cmsCounters(a.union(b), "v").collect().toSet
    assert(ca.merge(cb).counters.collect().toSet == direct)
    val cdir = java.nio.file.Files.createTempDirectory("cms_store").toString
    ca.save(cdir)
    val cLoaded = Sketches.loadCms(spark, cdir)
    assert(cLoaded.depth == 4 && cLoaded.widthPow == 10)
    assert(cLoaded.counters.collect().toSet == ca.counters.collect().toSet)
    intercept[IllegalArgumentException](
      ca.merge(Sketches.CmsStore(cb.counters, 4, 11)))

    val ha = Sketches.HistStore(
      Sketches.logHistogram(a.select(length(col("v")).as("n")), "n", Seq.empty), 5, Seq.empty)
    val hdir = java.nio.file.Files.createTempDirectory("hist_store").toString
    ha.save(hdir)
    val hLoaded = Sketches.loadHist(spark, hdir)
    assert(hLoaded.subBits == 5 && hLoaded.groupCols.isEmpty)
    assert(hLoaded.hist.collect().toSet == ha.hist.collect().toSet)
    val q = hLoaded.quantiles(Seq(("p50", 1, 2))).head.getLong(1)
    assert(q >= 3 && q <= 4, s"median of 'mixed 3-4 char values' bucket low, got $q")
    intercept[IllegalArgumentException](
      ha.merge(Sketches.HistStore(ha.hist, 6, Seq.empty)))
  }
}
