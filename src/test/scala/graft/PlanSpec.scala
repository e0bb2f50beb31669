package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression guards for the flagship queries: these pin
  * the PLAN SHAPES the 100 TB design depends on, so a refactor that
  * silently turns a broadcast into a shuffle, un-pushes a filter, or
  * introduces a cartesian product fails here rather than in a benchmark
  * three rounds later. All checks run at sf0.001 (plan shape is
  * scale-independent below AQE's broadcast thresholds). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString()

  test("heavy text gates stay ABOVE the spread exchange (evalHere barrier)") {
    // the text-kernel page gates must evaluate post-spread (32-way), not
    // be predicate-pushed into the single-split gate scan (r13
    // optimization round: the pushed form ran the whole substituted
    // kernel per row on ONE task — 0.93 s of q_gopher_repetition's
    // 1.7 s). The pin: no Filter node re-deriving the tokenizer sits
    // directly on the parquet scan.
    for (q <- Seq("q_gopher_repetition", "q_c4_clean")) {
      val p = plan(q)
      val scanFilter =
        "(?s)Filter [^\\n]*regexp_replace[^\\n]*\\n[^\\n]*Scan parquet".r
      assert(scanFilter.findFirstIn(p).isEmpty,
        s"$q: text-kernel filter was pushed into the scan stage")
    }
  }

  test("q_filter_dsl: predicates reach the parquet scan") {
    val p = plan("q_filter_dsl")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert("PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(p).isDefined,
      "expected non-empty pushed filters")
  }

  test("q_annotate_join: dimension joins broadcast") {
    val p = plan("q_annotate_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dim join must not shuffle-sort")
  }

  test("q_decontaminate: eval grams broadcast; corpus side never sorts for the join") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("LSH dedup queries: no cartesian product anywhere") {
    Seq("q_dedup_minhash", "q_dedup_ngram", "q_dedup_incremental",
      "q_dedup_pipeline", "q_curation_pipeline",
      "q_dedup_spans_incremental", "q_source_overlap").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join")
    }
  }

  test("containment gates: candidates ride hash joins, never an all-pairs product") {
    // the prefix-filter scale contract: the candidate join keys on the
    // gram (hash join); a cartesian/nested-loop anywhere means the
    // all-pairs ground truth leaked into the OPERATOR
    Seq("q_dedup_containment", "q_containment_scrub").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("q_stream_join: range predicate rides an equi-join, not a nested loop") {
    val p = plan("q_stream_join")
    assert(p.contains("Join") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("q1_agg: two-phase aggregation (map-side partial)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final hash aggregation")
  }

  test("q_lm_kneser_ney: all three count joins broadcast; no cartesian product") {
    val p = plan("q_lm_kneser_ney")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "bigram/context/continuation model joins must broadcast, not shuffle-sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_similarity_pq: query side broadcast into the ADC scan; codegen'd pq expressions; corpus never shuffles before scoring") {
    val p = plan("q_similarity_pq")
    // the queries×corpus scan is a broadcast nested loop over the TINY
    // broadcast query side (8 rows) — the corpus streams map-side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "ADC scan must broadcast the query side, not materialize a cartesian")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      "native PQ expressions must be in the plan")
  }

  test("q_similarity_ivfpq: probe side broadcast into the cell hash join; no cartesian; corpus never sort-merges") {
    val p = plan("q_similarity_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "the probe side must broadcast into the cell join, not shuffle-sort the codes")
    assert(p.contains("pq_encode") && p.contains("pq_adc"))
  }

  test("q_similarity_bq: sign packing native, query side broadcast, no sort-merge") {
    val p = plan("q_similarity_bq")
    assert(p.contains("sign_pack"), "native sign packing must be in the plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_embedding_neardup_incr: cell join, no cartesian, candidates scored in-join") {
    val p = plan("q_embedding_neardup_incr")
    assert(!p.contains("CartesianProduct"),
      "the incremental embedding screen must join on cell id, not cross")
    assert(p.contains("dot_arr"), "exact verification must be the native dot")
  }

  test("q_lm_perplexity: model joins broadcast; no cartesian product") {
    val p = plan("q_lm_perplexity")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "bigram/context model joins must broadcast, not shuffle-sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_split_hash and q_chunk_windows: map-side only (no exchange before the output sort)") {
    // q_quality_classifier rides along: its FIT runs eagerly at query
    // build (iteration aggregates), but the returned SCORING plan must
    // be pure map-side — w·x+b as a project over the scan
    Seq("q_split_hash", "q_chunk_windows", "q_quality_classifier").foreach { q =>
      val p = plan(q)
      // the gate query orders its output for the deterministic dump; a
      // single range-partitioning exchange for that sort is the ONLY
      // shuffle allowed — the operator itself must add none
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
      assert(exchanges.forall(_.contains("rangepartitioning")),
        s"$q shuffles beyond the output sort: $exchanges")
    }
  }

  test("new text gates are map-side (no exchange before the output sort)") {
    // c4 cleaning, line dedup, gopher composition+repetition rules, and
    // DSIR SCORING are all per-row transforms/predicates: the only
    // shuffle any of them may show is the deterministic output sort
    // (the DSIR fit, like the classifier fit, runs eagerly at build)
    Seq("q_c4_clean", "q_line_dedup", "q_gopher_filter",
      "q_gopher_repetition").foreach { q =>
      val p = plan(q)
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
      assert(exchanges.forall(_.contains("rangepartitioning")),
        s"$q shuffles beyond the output sort: $exchanges")
    }
  }

  test("q_dsir_select: map-side scoring into a TakeOrdered — no full sort, no join") {
    val p = plan("q_dsir_select")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
    assert(exchanges.isEmpty,
      s"scoring must not shuffle the corpus (top-k is a per-partition heap): $exchanges")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the 64-entry model rides as a literal map, not a join")
  }

  test("q_mixture_select: map-side keep filter (broadcast thresholds, no operator shuffle)") {
    val p = plan("q_mixture_select")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"thinning must not shuffle the corpus: $exchanges")
  }

  test("q_contamination_report: eval gram pairs broadcast; no cartesian") {
    val p = plan("q_contamination_report")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_bm25: query-term and df joins broadcast; corpus never sort-merges") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "query-side tables are broadcast-sized; the corpus must not shuffle-sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_temperature_mix: map-side keep filter (broadcast thresholds, no operator shuffle)") {
    val p = plan("q_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"thinning must not shuffle the corpus: $exchanges")
  }

  test("q_semdedup: pair scan joins on cluster id — no cartesian/nested-loop") {
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_shuffle_order / q_token_budget: every window is partitioned (no single-partition stage)") {
    Seq("q_shuffle_order", "q_token_budget").foreach { q =>
      val p = plan(q)
      // WindowExec prints "Window [..], [partSpec], [orderSpec]"; the
      // single-partition trap prints an empty partition spec — which
      // also surfaces as an Exchange SinglePartition feeding it
      assert(!p.contains("Exchange SinglePartition"),
        s"$q funnels through one partition:\n${p.take(2000)}")
      assert(p.contains("rangepartitioning"),
        s"$q must range-partition on the hash:\n${p.take(2000)}")
    }
  }

  test("q_dedup_spans: map-side-combinable dup detection, no window, payload off the gram shuffle") {
    graft.core.CacheScope.releaseAll()
    val p = plan("q_dedup_spans")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"),
      s"span scrub funnels through one partition:\n${p.take(2000)}")
    // duplicate detection must be the aggregate+join form — a Window
    // over the gram key would funnel a flood gram's every occurrence
    // through one task, and AQE cannot split a window partition
    assert(!p.contains("Window ["),
      s"span scrub regressed to a gram window:\n${p.take(3000)}")
    // the gram-keyed exchanges carry (doc, start, gram) only — token
    // arrays and text must not ride that shuffle
    p.linesIterator.filter(_.contains("hashpartitioning(gram")).foreach { l =>
      assert(!l.contains("__toks") && !l.contains("text#"),
        s"gram shuffle carries payload columns: $l")
    }
  }

  test("scans prune columns: q_sort_topk reads only what it selects") {
    val p = plan("q_sort_topk")
    val read = "ReadSchema: [^\\n]+".r.findFirstIn(p).getOrElse("")
    assert(read.nonEmpty, "no ReadSchema in plan")
    assert(!read.contains("l_comment"),
      s"scan reads unused wide column: $read")
  }

  test("document/embedding scans prune to the columns the query touches") {
    // a CacheScope entry from a concurrently-running suite can replace
    // the file scan with an InMemoryTableScan (whose description embeds
    // the ORIGINAL full-width ReadSchema) — release our caches first and
    // skip any query that still got cache-substituted; the guard then
    // checks every plan that actually scans parquet
    graft.core.CacheScope.releaseAll()
    def readSchema(q: String): Option[String] = {
      val p = plan(q)
      if (p.contains("InMemoryTableScan")) None
      else "ReadSchema: [^\\n]+".r.findFirstIn(p)
    }
    // q_text_stats derives everything from text — the wide source/lang
    // metadata must not reach the scan
    readSchema("q_text_stats").foreach { r =>
      assert(r.contains("text") && !r.contains("source"),
        s"documents scan not pruned: $r")
    }
    // q_shuffle_order needs only doc_id — text must not be read
    readSchema("q_shuffle_order").foreach { r =>
      assert(r.contains("doc_id") && !r.contains("text"),
        s"shuffle-order scan not pruned: $r")
    }
    readSchema("q_similarity_topk").foreach { r =>
      assert(r.contains("embedding"), s"embeddings scan: $r")
    }
    // q_url_normalize synthesizes its URLs from doc_id — the text
    // payload must not be read
    readSchema("q_url_normalize").foreach { r =>
      assert(r.contains("doc_id") && !r.contains("text"),
        s"url-normalize scan not pruned: $r")
    }
  }

  test("LshIndex.probe serves the corpus side from cached index frames") {
    // the index's whole reason to exist: a probe must join the PREBUILT
    // band/shingle caches, never re-derive the corpus side — if the
    // retain calls are ever dropped, every micro-batch would pay the
    // full corpus shingle+signature pass again
    graft.core.CacheScope.releaseAll()
    val d = Tables.documents(spark, dir)
    val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val idx = graft.operators.LshIndex.build(corpus, "text", "doc_id")
    val p = idx.probe(probe, "text", "doc_id")
      .queryExecution.executedPlan.toString()
    val n = "InMemoryTableScan".r.findAllIn(p).size
    assert(n >= 2,
      s"probe plan must scan cached corpus bands+shingles, found $n InMemoryTableScan nodes:\n${p.take(1500)}")
  }

  test("q_noiseq_bio: pooled stats and densities return by broadcast; no shuffle-sort joins") {
    val p = plan("q_noiseq_bio")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "nclust-sized pools and bin-sized densities must broadcast back")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_langid (Cavnar–Trenkle): row-local kernel — no gram shuffle at all") {
    val p = plan("q_langid")
    // round-13 contract: classification is a pure per-row kernel against
    // the closure profiles — no generated gram table, no aggregation,
    // no window, no join; the ONLY exchange is the gate's output
    // orderBy (range partitioning), never a hash shuffle
    assert(!p.contains("Generate"), "gram explode reappeared")
    assert(!p.contains("Window"), "rank window reappeared")
    assert(!p.toLowerCase.contains("join"), "profile join reappeared")
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"non-output-sort exchange in q_langid: $exchanges")
  }

  test("q_curriculum: every window is partitioned (two-phase rank, no single-partition stage)") {
    val p = plan("q_curriculum")
    // Spark renders a partitioned window as "Window [exprs], [partition],
    // [ordering]" (three bracket groups) and a GLOBAL window with only
    // two — the single-partition trap this operator exists to avoid
    val wins = "Window \\[[^\\]]*\\], \\[[^\\]]*\\](?!, \\[)".r
    assert(wins.findFirstIn(p).isEmpty, "found a window without a partition spec")
    assert(p.contains("Window ["), "expected the two-phase rank window in the plan")
  }

  test("q_kcenter result is driver-assembled from TakeOrdered scans (no shuffle in the final frame)") {
    val p = plan("q_kcenter")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(1000))
  }

  test("perceptual near-dup queries: banded joins only, no cartesian/nested-loop") {
    Seq("q_image_neardup", "q_audio_neardup", "q_video_neardup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("q_sketch_hll: register aggregation is two-phase (map-side partial max)") {
    val p = plan("q_sketch_hll")
    // the register build must partial-aggregate before the shuffle — at
    // 100 TB the shuffle carries <=2^p rows per group, never the stream
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sketch_cms: counters broadcast into the point-query join; sums partial-aggregate") {
    val p = plan("q_sketch_cms")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the <=depth*width counter frame must broadcast, never shuffle-sort")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("q_zorder / q_hilbert: index math is codegen'd map-side into a two-phase grid rollup") {
    Seq("q_zorder", "q_hilbert").foreach { q =>
      val p = plan(q)
      assert("HashAggregate".r.findAllIn(p).length >= 2, s"$q: ${p.take(1000)}")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), q)
      assert(!p.contains("Exchange hashpartitioning") ||
        "Exchange".r.findAllIn(p).length <= 2,
        s"$q: the only exchanges should be the rollup + output sort")
    }
  }

  test("chat gates: every window is partitioned by the conversation (no global stage)") {
    Seq("q_chat_flatten", "q_chat_pack").foreach { q =>
      val p = plan(q)
      // "Window [funcs], [partition], [ordering]" — a global window has
      // only two bracket groups (see q_curriculum above)
      val bare = "Window \\[[^\\]]*\\], \\[[^\\]]*\\](?!, \\[)".r
      assert(bare.findFirstIn(p).isEmpty, s"$q has a window without a partition spec")
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("q_sketch_kmv: KMV aggregation runs map-side partials (ObjectHashAggregate)") {
    val p = plan("q_sketch_kmv")
    // the typed Aggregator must plan as ObjectHashAggregate with a
    // partial stage — the shuffle then carries <=k longs per group per
    // task, the whole point of the bounded-state sketch
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p.take(2000))
    // the |sources|^2 signature cross-join is deliberate (sketch rows are
    // tiny); what must never cross-join is the gram stream itself — the
    // exact-jaccard audit join is an equi-join on the gram
    assert(p.contains("Join"), p.take(500))
  }
}
