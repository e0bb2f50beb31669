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

  test("hashSplit: fractions honored, growth-stable, partitioning-independent") {
    val fr = Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1))
    val ids = spark.range(20000).select(col("id").as("doc_id"))
    val split = Sampling.hashSplit(ids, "doc_id", fr)
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == 20000)
    // binomial(20000, 0.1) has σ ≈ 42; ±5σ bounds
    assert(math.abs(byName("train") - 16000) < 300, s"$byName")
    assert(math.abs(byName("valid") - 2000) < 220, s"$byName")
    assert(math.abs(byName("test") - 2000) < 220, s"$byName")
    // growth stability: assignments of the first 5000 ids are unchanged
    // when 15000 more arrive (per-id hashing — no reshuffling on growth)
    val small = Sampling.hashSplit(
      spark.range(5000).select(col("id").as("doc_id")), "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = split.where(col("doc_id") < 5000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == big)
    // partitioning independence
    val rep = Sampling.hashSplit(ids.repartition(13), "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rep == split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("hashSplit validates its fractions") {
    val ids = spark.range(10).select(col("id").as("doc_id"))
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "doc_id", Seq.empty)
    }
  }
}
