package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}
import graft.functions.TextFunctions

/** Round-5 curation additions: fuzzy (edit-budget) near-dup pairs,
  * unit-level exact dedup, weighted reservoir sampling, and the
  * line-level boilerplate strip. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyNearDupPairs: edit budget decides membership; distance is exact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"), // 3 edits from 1
      (3L, "the quick brown fox jumps over the lazy dog again and again!!"), // ~2 edits from 1 (normalized: trailing junk stripped)
      (4L, "entirely different content about database query planning engines"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyNearDupPairs(docs, "text", "doc_id", maxEdits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 3)
    // 3 normalizes to doc 1's exact text (punctuation stripped) → dist 0
    assert(out.contains((1L, 3L)) && out((1L, 3L)) == 0)
    assert(out.contains((2L, 3L)) && out((2L, 3L)) == 3)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc must produce no pair")
  }

  test("fuzzyNearDupPairs: banded candidates equal exact ground truth on the fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val lsh = Dedup.fuzzyNearDupPairs(docs, "text", "doc_id", maxEdits = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // exact ground truth by brute force over normalized text
    val norm = docs.select(col("doc_id"),
      TextFunctions.normalizeText(col("text")).as("nt"))
    val exact = norm.alias("a").join(norm.alias("b"),
      col("a.doc_id") < col("b.doc_id"))
      .withColumn("d", levenshtein(col("a.nt"), col("b.nt")))
      .where(col("d") <= 20)
      .select(col("a.doc_id"), col("b.doc_id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size}")
    assert(exact.nonEmpty, "fixture must contain fuzzy pairs for this test to bite")
  }

  test("unitExactDedup: first occurrence survives, repeats drop, order keeps") {
    val units = Seq(
      (1L, 0L, "alpha beta"), (1L, 1L, "gamma delta"), (1L, 2L, "alpha beta"),
      (2L, 0L, "alpha beta"), (2L, 1L, "epsilon zeta"),
      (3L, 0L, "gamma delta"))
      .toDF("doc_id", "pos", "unit")
    val out = Dedup.unitExactDedup(units, "doc_id", "pos", "unit", delim = " | ")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 owns both units' first occurrences; its pos-2 repeat drops
    assert(out(1L) == "alpha beta | gamma delta")
    // doc 2 keeps only its novel unit; doc 3 vanishes entirely
    assert(out(2L) == "epsilon zeta")
    assert(!out.contains(3L))
  }

  test("corpusDiff: null text is a present row, not a membership change") {
    val before = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option("a")), (4L, Option("gone"))).toDF("doc_id", "text")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("a")), (5L, Option("new"))).toDF("doc_id", "text")
    val out = Dedup.corpusDiff(before, after, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 exists in BOTH snapshots; text 'x' → NULL is a content change,
    // not a removal — the presence markers, not fingerprint nullness, decide
    assert(out.get(1L).contains("changed"))
    // null → null compares unchanged (null-safe fingerprint compare)
    assert(!out.contains(2L) && !out.contains(3L))
    assert(out.get(4L).contains("removed") && out.get(5L).contains("added"))
  }

  test("groupOverlapMatrix: null group labels bucket under ∅, not their partner's label") {
    val t = "the quick brown fox jumps over the lazy dog in the warm afternoon sun"
    val docs = Seq((1L, t, Option("web")), (2L, t, Option.empty[String]),
      (3L, "completely unrelated text about database planning", Option("web")))
      .toDF("doc_id", "text", "source")
    val out = Dedup.groupOverlapMatrix(docs, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("web", "∅") -> 1L) || out == Map(("∅", "web") -> 1L),
      s"null-group doc must surface as its own ∅ bucket, got $out")
  }

  test("weightedReservoir: exact k, deterministic, weight-monotone inclusion") {
    val n = 2000
    // two weight classes: heavy (100) vs light (1)
    val df = spark.range(n).select(col("id"),
      when(col("id") % 2 === 0, 100.0).otherwise(1.0).as("w"))
    val s1 = Sampling.weightedReservoir(df, "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedReservoir(df, "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must reproduce the same sample")
    assert(s1.size == 200)
    val heavy = s1.count(_ % 2 == 0)
    // E[heavy] with 100:1 weights is near 200; even a loose bound proves
    // weight-monotone inclusion (uniform sampling would give ~100)
    assert(heavy > 150, s"heavy-class count $heavy not weight-biased")
    // zero/null weights are excluded, never sampled
    val withZero = df.withColumn("w", when(col("id") === 7, 0.0).otherwise(col("w")))
    assert(!Sampling.weightedReservoir(withZero, "id", "w", k = n)
      .collect().map(_.getLong(0)).contains(7L))
  }

  test("stripBoilerplate: chrome lines drop, prose survives with newlines intact") {
    val doc = Seq(
      ">> home | products | login | cart (0) <<\n" +
        "the quick brown fox jumps over the lazy dog\n" +
        "another fine line of honest prose for testing\n" +
        "(c) 2024 | all rights reserved.\n" +
        "cookies: accept-all").toDF("text")
    val out = doc.select(TextFunctions.stripBoilerplate(col("text")).as("c"))
      .head.getString(0)
    assert(out == "the quick brown fox jumps over the lazy dog\n" +
      "another fine line of honest prose for testing")
    // fully-boilerplate document → empty string
    val empty = Seq("home | login\n(c) 2024").toDF("text")
      .select(TextFunctions.stripBoilerplate(col("text")).as("c")).head.getString(0)
    assert(empty == "")
  }
}
