package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Quota sampling: exact per-group cap, determinism, small groups kept
  * whole, and equality with the naive full-sort selection. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("caps each group at the quota; smaller groups kept whole") {
    val out = Sampling.quotaPerGroup(docs, "source", "doc_id", quota = 7)
    val sizes = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (g, n) =>
      assert(sizes(g) == math.min(7L, n), s"group $g: ${sizes.get(g)} of $n")
    }
  }

  test("equals the naive full-sort selection (pre-filter is exact)") {
    val quota = 5
    val fast = Sampling.quotaPerGroup(docs, "source", "doc_id", quota)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // naive reference: rank EVERYTHING per group by the same hash
    val h = graft.functions.TextFunctions.portableHash(
      concat_ws(":", col("doc_id").cast("string"), lit("42")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
    val naive = docs.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= quota)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fast == naive)
  }

  test("deterministic across runs; different seeds give different samples") {
    def run(seed: Long) = Sampling.quotaPerGroup(docs, "source", "doc_id", 10, seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(42L) == run(42L))
    assert(run(42L) != run(7L), "independent seeds should select differently")
  }
}
