package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up measurement probe (not a test; Test/runMain graft.ScaleProbe
  * [reps] [query...]): materializes a `reps`× blow-up of the sf0.1
  * tables under target/ and times queries at both scales to measure how
  * close each operator is to linear scaling — the local stand-in for
  * "would this plan survive a 100× scale-up".
  *
  * The blow-up keeps realistic structure instead of duplicating rows:
  *  - lineitem/orders/part/documents/embeddings replicate with key
  *    offsets, so the genes axis (l_partkey), the order axis and the
  *    corpus all genuinely grow `reps`×;
  *  - replica documents salt every 3rd word, so replicas are NOT
  *    near-duplicates of the originals and candidate-pair counts stay
  *    realistic for the minhash/simhash paths;
  *  - replica embeddings jitter each coordinate ±3%, keeping cosine
  *    structure without exact duplicates.
  */
object ScaleProbe {
  private val Off = 10000000L

  private def replicate(df: DataFrame, reps: Int)(edit: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until reps).map(r => edit(df, r)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 10
    val base = "/root/testdata/sf0.1"
    val out = s"target/scaled${reps}x"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q1_agg", "q_filter_dsl", "q_window_rank", "q_sort_topk", "q_setops",
      "q_star_join", "q_annotate_join", "q_cpm", "q_zscale_matrix",
      "q_tmm_logcpm", "q_edger", "q_deseq2_wald", "q_vst", "q_kmeans",
      "q_dbscan", "q_pca", "q_text_stats", "q_text_curation",
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
      "q_similarity_topk", "q_embedding_neardup", "q_embedding_neardup_approx",
      "q_agglo_10k",
      "q_bm25", "q_bm25_index", "q_semdedup", "q_semdedup_scaled",
      "q_temperature_mix", "q_bpe_tokens",
      "q_similarity_lsh", "q_similarity_ivf", "q_shuffle_order",
      "q_token_budget", "q_token_budget_group", "q_stream_running",
      "q_asof_forward", "q_asof_nearest", "q_skew_join", "q_dedup_spans",
      "q_dedup_spans_incremental", "q_source_overlap",
      "q_url_normalize", "q_shard_manifest", "q_curation_pipeline2",
      "q_corpus_diff",
      "q_dedup_spans_incremental_bloom", "q_decontaminate_bloom",
      "q_url_dedup", "q_url_domain_psl", "q_dedup_cluster_forcedcc",
      "q_lsh_index", "q_url_domain_psl10k", "q_pack_bpe",
      "q_split_leakage", "q_domain_quota", "q_blocklist_filter",
      "q_quality_classifier", "q_pack_stats",
      "q_span_index", "q_span_index_bloom", "q_quality_fit1", "q_quality_filter1",
      "q_mp4_meta", "q_mixture_select", "q_gopher_filter",
      "q_c4_clean", "q_line_dedup", "q_dedup_cluster_best",
      "q_contamination_report", "q_dsir_select", "q_gopher_repetition",
      "q_curation_pipeline3", "q_eval_index", "q_eval_index_bloom", "q_mojibake", "q_span_stats",
      "q_unicode_clean", "q_epoch_mix", "q_eval_contamination",
      "q_tokenized_export", "q_ccnet_buckets", "q_training_export",
      "q_html_extract", "q_robots_filter", "q_crawl_pipeline",
      "q_mix_report", "q_sentence_dedup")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.parquet carries TIMESTAMP(NANOS) — readable only as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def rd(dir: String, t: String) = spark.read.parquet(s"$dir/$t.parquet")

    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      println(s"building $out (${reps}x sf0.1) ...")
      Seq("region", "nation", "customer", "supplier").foreach { t =>
        rd(base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      replicate(rd(base, "lineitem"), reps) { (df, r) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(r * Off))
          .withColumn("l_partkey", col("l_partkey") + lit(r * Off))
      }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      replicate(rd(base, "orders"), reps) { (df, r) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(r * Off))
      }.write.mode("overwrite").parquet(s"$out/orders.parquet")
      replicate(rd(base, "part"), reps) { (df, r) =>
        df.withColumn("p_partkey", col("p_partkey") + lit(r * Off))
      }.write.mode("overwrite").parquet(s"$out/part.parquet")
      replicate(rd(base, "documents"), reps) { (df, r) =>
        // replica r>0 rewrites the VOCABULARY: every content word maps
        // to a replica-specific pseudoword (base-36 of a seeded hash). A
        // bijection on words keeps each replica's internal near-dup
        // structure identical to the original corpus while making
        // replicas mutually unrelated — naive salting (same suffix on
        // every word) instead ADDS shared structure between all docs of
        // a replica and inflates the baseline Jaccard from ~0.17 to
        // ~0.6, drowning the measurement in data-created pairs.
        // STOPWORDS stay verbatim: they carry the langid/quality signal
        // the curation gates filter on — rotating them made every
        // replica "und" and the 100x pipeline probe silently measured a
        // corpus whose first gate pruned 99% of it (round-7 find). The
        // shared stopwords add only stopword-derived shingles across
        // replicas, far below every banding threshold.
        val keepWords = array(
          graft.functions.TextFunctions.Stopwords.map(lit): _*)
        val rotated =
          if (r == 0) col("text")
          else array_join(transform(split(col("text"), " "),
            w => when(array_contains(keepWords, lower(w)), w)
              .otherwise(lower(conv(pmod(xxhash64(w, lit(r)), lit(2176782336L))
                .cast("string"), 10, 36)))), " ")
        df.withColumn("doc_id", col("doc_id") + lit(r * Off))
          .withColumn("text", rotated)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
      replicate(rd(base, "embeddings"), reps) { (df, r) =>
        val jittered =
          if (r == 0) col("embedding")
          else transform(col("embedding"), (x, i) =>
            (x * (lit(1.0f) + (pmod(i + lit(r * 31), lit(7)) - lit(3)).cast("float") * lit(0.01f)))
              .cast("float"))
        df.withColumn("vec_id", col("vec_id") + lit(r * Off))
          .withColumn("embedding", jittered)
      }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println("built.")
    }
    // events replicated by user/event offsets (replicas are disjoint user
    // populations in the same time range — the realistic way traffic
    // grows: more users, not a longer history). Guarded separately so a
    // scaled dir built by the older copy-as-is code self-heals.
    locally {
      val f = s"$out/events.parquet"
      val needs = !new java.io.File(f).exists() ||
        spark.read.parquet(f).count() == rd(base, "events").count()
      if (needs) {
        println(s"replicating events ${reps}x ...")
        replicate(rd(base, "events"), reps) { (df, r) =>
          df.withColumn("event_id", col("event_id") + lit(r * Off))
            .withColumn("user_id", col("user_id") + lit(r * Off))
        }.write.mode("overwrite").parquet(f)
      }
    }

    // JVM / codegen warm-up outside the timed region
    SparkEntry.queries("q1_agg")(spark, base).count()

    println(f"${"query"}%-22s ${"sf0.1"}%9s ${reps + "x"}%9s ${"ratio"}%7s  rows(${reps}x)")
    // probe-only entries exercising paths the driver contract leaves on
    // auto (the forced-approx near-dup demonstrates the IVF branch's
    // sub-quadratic growth even while the corpus sits under the cutoff)
    def query(n: String, dir: String): DataFrame = n match {
      case "q_embedding_neardup_approx" =>
        operators.Similarity.embeddingNearDupPairs(
          Tables.embeddings(spark, dir), "embedding", "vec_id", 0.45,
          approximate = Some(true))
      case "q_semdedup_scaled" =>
        // the 100TB knob contract exercised: nClusters grows with the
        // corpus so pairs-per-cell stays flat and Σc² scales linearly —
        // the fixed-knob q_semdedup entry measures what happens when a
        // caller does NOT scale the knob (superlinear by design, and at
        // 30x the mega-cell guard's sub-split bounds it)
        val n = Tables.embeddings(spark, dir).count()
        operators.SemDedup.prune(
          Tables.embeddings(spark, dir).repartition(8, col("vec_id"))
            .sortWithinPartitions("vec_id"),
          "embedding", "vec_id",
          nClusters = math.max(8, (8L * n / 5000L).toInt), tau = 0.35)
      case "q_agglo_10k" =>
        // the driver query caps at 200 rows; this exercises the exact
        // NN-chain Ward at its 10k-row default cap
        operators.AggloOp(nClusters = 3, sort = false, protect = Seq("l_partkey"))(
          Tables.lineitem(spark, dir).groupBy(col("l_partkey"))
            .agg(
              sum(when(col("l_returnflag") === "A", 1).otherwise(0)).cast("double").as("rf_a"),
              sum(when(col("l_returnflag") === "N", 1).otherwise(0)).cast("double").as("rf_n"),
              sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("double").as("rf_r"))
            .orderBy("l_partkey").limit(10000))
      case "q_dbscan_grid" =>
        // the gate query pins exactOnly (its oracle depends on exact
        // semantics) and its guard refuses >10k rows by design; this
        // entry exercises the documented scale path — grid DBSCAN over
        // ε-side cells — on the same matrix shape
        operators.DbscanOp(eps = 1.8, minSamples = 4,
          protect = Seq("l_partkey"))(
          Tables.lineitem(spark, dir).groupBy(col("l_partkey"))
            .agg(
              sum(when(col("l_returnflag") === "A", 1).otherwise(0)).cast("double").as("rf_a"),
              sum(when(col("l_returnflag") === "N", 1).otherwise(0)).cast("double").as("rf_n"),
              sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("double").as("rf_r"))
            .where(col("rf_a") + col("rf_n") + col("rf_r") >= 38))
      case "q_dedup_cluster_forcedcc" =>
        // distributedCC's forced path: every bench corpus sits far under
        // the 1M-edge driver cap, so the propagation loop has parity
        // specs but no scale measurement — force it (maxDriverEdges=0)
        // over the real LSH pair graph and report rounds-to-convergence
        val (cc, rounds) = operators.Dedup.connectedComponentsWithRounds(
          operators.Dedup.minHashLshPairs(
            Tables.documents(spark, dir), "text", "doc_id"),
          "id_a", "id_b", maxDriverEdges = 0L)
        println(s"  [forcedcc rounds=$rounds]")
        cc
      case "q_bitext_indexed_scaled" =>
        // the 100TB knob contract for indexed bitext mining: the gate
        // pins nprobe = nlist = 8 to be EXACT (its oracle demands it),
        // which degenerates to a full scan as n grows. At scale the
        // knob grows with the corpus (the 4*sqrt(n) auto-nlist rule) so
        // per-query candidate work stays ~8/nlist of a side — this
        // entry measures that contract, the fixed-knob gate entry
        // measures what happens when a caller does not scale the knob
        // (quadratic by design).
        val e = Tables.embeddings(spark, dir)
        val a = e.where(pmod(col("vec_id"), lit(2)) === 0)
        val b = e.where(pmod(col("vec_id"), lit(2)) =!= 0)
        val n = e.count()
        val nlist = math.max(8, (4.0 * math.sqrt(n / 2.0)).toInt)
        val idxA = operators.Similarity.IvfIndex.build(a, "embedding", "vec_id", nlist = nlist)
        val idxB = operators.Similarity.IvfIndex.build(b, "embedding", "vec_id", nlist = nlist)
        operators.Similarity.bitextMineIndexed(a, b, idxA, idxB,
          "embedding", "vec_id", k = 4, threshold = 1.02, nprobe = 8)
      case "q_dedup_winnow_scaled" =>
        // the scale form: LSH-banded fingerprint candidates + exact
        // coverage verify — candidate volume bounded by the banding
        // whatever the fingerprint skew (the exact gate form's fp-keyed
        // join measured 93.8x at 30x on this template-heavy corpus)
        operators.Dedup.winnowNearDupPairsBanded(
          Tables.documents(spark, dir), "text", "doc_id",
          k = 5, w = 4, minShared = 5, minCoverage = 0.9)
      case "q_knn_graph_scaled" =>
        // the 100TB knob contract for the self graph: the gate pins
        // nprobe = nlist = 8 for oracle exactness (degenerates to a
        // full scan as n grows); at scale nlist follows the 4*sqrt(n)
        // auto rule with nprobe fixed, so per-query candidate work
        // stays ~nprobe/nlist of the corpus
        operators.Similarity.knnGraphIndexed(
          Tables.embeddings(spark, dir), "embedding", "vec_id", 5,
          nlist = 0, nprobe = 12)
      case "q_semantic_families_scaled" =>
        // families over the scaled-knob indexed graph — the composition
        // the exact-quadratic gate form stands in for
        operators.Similarity.semanticFamiliesFromGraph(
          operators.Similarity.knnGraphIndexed(
            Tables.embeddings(spark, dir), "embedding", "vec_id", 4,
            nlist = 0, nprobe = 12), "vec_id")
      case _ => SparkEntry.queries(n)(spark, dir)
    }

    names.foreach { n =>
      def t(dir: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = query(n, dir).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      try {
        val (t0, _) = t(base)
        val (t1, c1) = t(out)
        println(f"SCALE $n%-22s $t0%8.2fs $t1%8.2fs ${t1 / t0}%6.1fx  $c1")
      } catch {
        case e: Throwable => println(s"SCALE $n FAILED: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
