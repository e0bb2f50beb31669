package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
