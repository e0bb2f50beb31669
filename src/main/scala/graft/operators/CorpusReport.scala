package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Corpus-level frequency diagnostics — the QA numbers a data card
  * reports before training: token/type totals and a Zipf's-law fit
  * (Zipf 1949; a healthy natural-language corpus shows ln(freq) falling
  * ~linearly in ln(rank) with slope ≈ −1; spam/boilerplate-heavy or
  * template-generated corpora bend it). */
object CorpusReport {

  /** One-row report: token/type totals, the modal word, and the OLS
    * slope+intercept of ln(freq) on ln(rank) over the `topN` most
    * frequent types.
    *
    * Scale shape: ONE shuffle (the word groupBy, map-side combined);
    * totals are an aggregate of the counts frame; the fit runs on the
    * `topN`-row TakeOrdered result, with the OLS sums decimal-exact
    * ([[graft.Tables.dsumWide]]) so the slope is partition-order
    * independent and replays exactly in the DuckDB oracle. The
    * single-partition window below ranks only the topN rows — bounded
    * by the knob, not the corpus. */
  /** Multi-level corpus rollup (the OLAP CUBE over the data-card
    * dimensions): doc counts and char sums at EVERY subset of the
    * grouping dimensions in one pass — per (lang, source), per lang,
    * per source, and the corpus total — distinguished by the standard
    * SQL `grouping_id` bitmask (dimension i aggregated-out ⇒ bit set;
    * NULL group labels are disambiguated from aggregated-out levels by
    * that bitmask, the textbook GROUPING() use). One partial-aggregated
    * pass; Catalyst expands the cube without rescanning. */
  def statsCube(docs: DataFrame, dims: Seq[String], charCol: String): DataFrame = {
    require(dims.nonEmpty, "CorpusReport.statsCube: no dimensions")
    val d = dims.map(col)
    docs.cube(d: _*)
      .agg(grouping_id().cast("long").as("grouping_id"),
        count(lit(1)).as("n_docs"),
        coalesce(sum(col(charCol)), lit(0L)).as("n_chars"))
      .select((dims.map(col) :+ col("grouping_id") :+ col("n_docs") :+
        col("n_chars")): _*)
      .orderBy(col("grouping_id") +: dims.map(c => col(c).asc_nulls_first): _*)
  }

  def zipfReport(docs: DataFrame, textCol: String, topN: Int = 200): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val counts = graft.core.CacheScope.retain(
      docs.where(col(textCol).isNotNull)
        .select(explode(tokens(lower(col(textCol)))).as("__w"))
        .groupBy("__w").agg(count(lit(1)).as("__c")))
    val totals = counts.agg(sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_types"))
    val top = counts.orderBy(col("__c").desc, col("__w")).limit(topN)
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("__c").desc, col("__w"))))
    val x = log(col("__rank").cast("double"))
    val y = log(col("__c").cast("double"))
    val fit = top.agg(
      count(lit(1)).cast("double").as("__n"),
      graft.Tables.dsumWide(x, 12).as("__sx"),
      graft.Tables.dsumWide(y, 12).as("__sy"),
      graft.Tables.dsumWide(x * x, 12).as("__sxx"),
      graft.Tables.dsumWide(x * y, 12).as("__sxy"),
      min(struct(col("__rank"), col("__w"), col("__c"))).as("__top1"))
    fit.crossJoin(totals).select(
      col("n_tokens"), col("n_types"),
      col("__top1.__w").as("top_word"), col("__top1.__c").as("top_freq"),
      ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
        (col("__n") * col("__sxx") - col("__sx") * col("__sx"))).as("zipf_slope"),
      ((col("__sy") - ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
        (col("__n") * col("__sxx") - col("__sx") * col("__sx"))) * col("__sx"))
        / col("__n")).as("zipf_intercept"))
  }

  /** Heaps'-law vocabulary-growth report (Heaps 1978: V ≈ K·nᵝ —
    * natural corpora grow vocabulary sublinearly, β ≈ 0.4–0.6;
    * template/duplicated corpora flatten toward 0, token-noise toward
    * 1): β and K fitted by decimal-exact OLS of ln(V) on ln(n) at
    * `points` id-ordered corpus prefixes.
    *
    * Scale shape: the growth curve needs no cumulative window — a
    * word's first occurrence (MIN doc id per word, one shuffle) plus
    * `points` conditional sums give every prefix's (n_tokens, V) in
    * one aggregate pass; the fit runs on the `points`-row frame. */
  def heapsReport(docs: DataFrame, textCol: String, idCol: String,
      points: Int = 10): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val base = graft.core.CacheScope.retain(
      docs.where(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as("__id"),
          explode(tokens(lower(col(textCol)))).as("__w")))
    val maxId = base.agg(max(col("__id"))).collect()(0).getLong(0)
    // id-arithmetic thresholds (replayable): ceil(maxId * k / points)
    val cuts = (1 to points).map(k =>
      (maxId.toDouble * k / points).ceil.toLong)
    val firstSeen = base.groupBy(col("__w"))
      .agg(min(col("__id")).as("__first"), count(lit(1)).as("__cnt"))
    // per-word token counts below each cut need the word's PER-PREFIX
    // count, not its total — so count tokens per (word-free) prefix
    // directly from the exploded frame, and vocabulary per prefix from
    // first occurrences: two tiny aggregate rows
    val tokAgg = base.agg(
      cuts.head.pipe(c => sum(when(col("__id") <= c, 1L).otherwise(0L)).as("t0")),
      cuts.tail.zipWithIndex.map { case (c, i) =>
        sum(when(col("__id") <= c, 1L).otherwise(0L)).as(s"t${i + 1}") }: _*)
      .collect()(0)
    val vocAgg = firstSeen.agg(
      cuts.head.pipe(c => sum(when(col("__first") <= c, 1L).otherwise(0L)).as("v0")),
      cuts.tail.zipWithIndex.map { case (c, i) =>
        sum(when(col("__first") <= c, 1L).otherwise(0L)).as(s"v${i + 1}") }: _*)
      .collect()(0)
    val spark = docs.sparkSession
    import spark.implicits._
    val pts = cuts.indices.map(i =>
      (i + 1, tokAgg.getLong(i), vocAgg.getLong(i)))
      .toDF("decile", "n_tokens", "n_types")
    val x = log(col("n_tokens").cast("double"))
    val y = log(col("n_types").cast("double"))
    val fit = pts.where(col("n_tokens") > 0).agg(
      count(lit(1)).cast("double").as("__n"),
      graft.Tables.dsumWide(x, 12).as("__sx"),
      graft.Tables.dsumWide(y, 12).as("__sy"),
      graft.Tables.dsumWide(x * x, 12).as("__sxx"),
      graft.Tables.dsumWide(x * y, 12).as("__sxy"))
    fit.crossJoin(pts.agg(max("n_tokens").as("n_tokens"), max("n_types").as("n_types")))
      .select(col("n_tokens"), col("n_types"),
        ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))).as("heaps_beta"),
        exp((col("__sy") - ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))) * col("__sx"))
          / col("__n")).as("heaps_k"))
  }
}
