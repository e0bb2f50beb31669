package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core on the box: the harness contract is local[32]
    // on a 32-cpu machine, and an unset env var must not quietly run the
    // whole bench on 4 threads (8x wall-clock at sf0.1)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warm-up OUTSIDE the timed region: without it
    // whichever query runs first absorbs ~5-10 s of one-time cost and the
    // per-query numbers are not comparable across runs
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.range(1000000).agg(sum(col("id"))).collect()
      val w = udf((x: Double) => x * 2)
      spark.range(1000).select(w(col("id").cast("double"))).agg(count(lit(1))).collect()
      // MLlib/BLAS one-time init, otherwise paid by the first ML query
      val tv = udf((d: Double) => org.apache.spark.ml.linalg.Vectors.dense(d, d * 0.5))
      new org.apache.spark.ml.clustering.KMeans().setK(2).setMaxIter(1).setSeed(1L)
        .setFeaturesCol("f")
        .fit(spark.range(64).select(tv(col("id").cast("double")).as("f")))
      // javax.imageio plugin-registry scan is a multi-second one-time
      // cost, otherwise paid inside the multimodal query's timing
      val png = graft.operators.Multimodal.ImageCodec.synthPng(2, 2, 1L)
      graft.operators.Multimodal.ImageCodec.decodeMeta(png)
      graft.operators.Multimodal.ImageCodec.features(png)
      // JIT-warm the HNSW build/search hot loops (interpreted first-run
      // cost measured ~3s, same class of one-time cost as the above)
      locally {
        val g = new graft.operators.Hnsw.Graph(8, 4, 16, 1L)
        (0 until 256).foreach { i =>
          g.insert(Array.tabulate(8)(d => math.sin(i * 8 + d)))
        }
        g.search(Array.tabulate(8)(d => math.cos(d)), 4, 16)
      }
      // JIT-warm the text/dedup kernels (quality, langid, shingles,
      // minhash): alphabetical bench order runs q_curation_pipeline
      // BEFORE the standalone text/dedup queries, so without this the
      // pipeline's number absorbs their one-time JIT cost
      locally {
        import graft.functions.TextFunctions._
        // enough rows × tokens that C2 actually compiles the shingle/
        // minhash/quality loops (64 short docs left them interpreted —
        // the pipeline query still paid ~10s of first-run JIT)
        val docs = spark.range(2048).select(col("id").as("doc_id"),
          concat(lit("the quick brown fox jumps over the lazy dog and then "
            + "walks back home counting stars along the river bank number "),
            col("id").cast("string")).as("text"))
        docs.select(qualityScore(col("text")), langId(col("text")),
          tokenCount(col("text")), repetitionStats(col("text"), 2))
          .agg(count(lit(1))).collect()
        graft.operators.Dedup.minHashLshPairs(docs, "text", "doc_id").count()
      }
    }
    // OS load average at the run boundaries: bench numbers on this box
    // swing up to 2x with background tenant load (see PERF.md round 4 —
    // the q_edger "regression" was exactly this), so the JSON records the
    // load so a polluted run is self-diagnosing
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg
    // deterministic order so per-query timings compare across rounds.
    // A throwing query must NOT be silently timed as near-zero (a broken
    // query would read as a perf win): record it, report it, exit nonzero.
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable => failures += (name -> t)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val failedNames = failures.map(_._1).toSet
    // a failed query's elapsed time is meaningless — null it in the JSON
    // so the persisted artifact cannot read as a perf win, and list the
    // failures in the line itself (the exit code alone doesn't travel
    // with an archived BENCH_rNN.json)
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (if (failedNames(k)) "null" else v.toString)
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failedNames(k) => v }.sum
    val failedJson = failedNames.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""failed":$failedJson,"load_start":$loadStart,"load_end":$loadAvg}"""
    println(json)
    // also persist to a file: the driver captures stdout's tail, and a
    // 70+-query JSON line has already been truncated mid-way once
    // (BENCH_r04.json "parsed": null) — the file copy survives any tail
    // length. Path overridable for local runs.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case t: Throwable =>
      System.err.println(s"bench: could not write $outPath: ${t.getMessage}")
    }
    spark.stop()
    if (failures.nonEmpty) {
      failures.foreach { case (name, t) =>
        System.err.println(s"BENCH FAILURE: $name — ${t.getClass.getName}: ${t.getMessage}")
      }
      System.err.println(s"${failures.length} of ${results.size} queries failed")
      sys.exit(1)
    }
  }
}
