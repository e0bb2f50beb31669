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

  test("temperatureMix: alpha=1 keeps everything; binding group kept whole") {
    val all = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 1.0)
    assert(all.count() == docs.count(), "alpha=1 is the natural mix — no thinning")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ts = Sampling.temperatureThresholds(counts, 0.5)
    // the most up-weighted (smallest n^(1-alpha)) group is kept whole
    val binding = counts.minBy { case (_, n) => math.pow(n.toDouble, 0.5) }._1
    assert(ts(binding) == (BigDecimal(2).pow(60)).toLong, s"$binding should be kept whole")
    val kept = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept(binding) == counts(binding))
    // every kept set is a subset of the source rows, deterministic
    val again = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("temperatureMix flattens toward the target composition") {
    // skewed synthetic: 1000 'big' vs 50 'small'
    val rows = spark.range(1050).select(col("id").as("doc_id"),
      when(col("id") < 1000, "big").otherwise("small").as("lang"))
    val counts = Map("big" -> 1000L, "small" -> 50L)
    val ts = Sampling.temperatureThresholds(counts, 0.5)
    // target shares: sqrt(1000):sqrt(50) ≈ 4.47:1 → big keep-rate =
    // (z·sqrt(50)·p_big)/1000 = sqrt(50/1000) ≈ 0.2236
    val rBig = ts("big").toDouble / math.pow(2.0, 60.0)
    assert(math.abs(rBig - math.sqrt(50.0 / 1000.0)) < 1e-12, s"rBig=$rBig")
    assert(ts("small") == BigDecimal(2).pow(60).toLong)
    val kept = Sampling.temperatureMix(rows, "lang", "doc_id", 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 50)
    // binomial(1000, .2236): σ ≈ 13 → ±5σ
    assert(math.abs(kept("big") - 224) < 66, s"kept=$kept")
  }

  test("temperatureMix validates alpha and null groups") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 1.5)
    }
    val withNull = docs.withColumn("lang",
      when(col("doc_id") % 10 === 0, null).otherwise(col("lang")))
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(withNull, "lang", "doc_id", 0.5)
    }
  }

  test("mixtureThresholds: binding whole, rates from the target shares, loud errors") {
    val counts = Map("big" -> 1000L, "small" -> 50L)
    val ts = Sampling.mixtureThresholds(counts, Map("big" -> 0.5, "small" -> 0.5))
    // ratio big = 1000/0.5 = 2000, small = 50/0.5 = 100 → small binds (whole)
    assert(ts("small") == BigDecimal(2).pow(60).toLong)
    // big keep rate = M·p/n = 100·0.5/1000 = 0.05 exactly
    assert(ts("big") == (BigDecimal(0.05) * BigDecimal(2).pow(60))
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    // zero-weight groups drop out of the threshold table entirely
    val dropped = Sampling.mixtureThresholds(counts,
      Map("big" -> 1.0, "small" -> 0.0))
    assert(!dropped.contains("small") && dropped("big") == BigDecimal(2).pow(60).toLong)
    // a weighted group the data lacks makes the composition unattainable
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureThresholds(counts, Map("big" -> 0.5, "ghost" -> 0.5))
    }
    assert(e.getMessage.contains("ghost"))
    intercept[IllegalArgumentException] {
      Sampling.mixtureThresholds(counts, Map("big" -> -0.1, "small" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureThresholds(counts, Map("big" -> 0.0, "small" -> 0.0))
    }
  }

  test("mixtureSelect: composition honored, unweighted groups dropped, deterministic") {
    // skewed synthetic: 1000 'big', 50 'small', 200 'other' (unweighted)
    val rows = spark.range(1250).select(col("id").as("doc_id"),
      when(col("id") < 1000, "big")
        .when(col("id") < 1050, "small").otherwise("other").as("lang"))
    val kept = Sampling.mixtureSelect(rows, "lang", "doc_id",
      Map("big" -> 0.5, "small" -> 0.5))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("other"), "a mix is a contract — unweighted groups drop")
    assert(kept("small") == 50, "binding group rides whole")
    // binomial(1000, 0.05): σ ≈ 6.9 → ±5σ around 50
    assert(math.abs(kept("big") - 50) < 35, s"kept=$kept")
    // determinism + subset-of-input
    def ids() = Sampling.mixtureSelect(rows, "lang", "doc_id",
      Map("big" -> 0.5, "small" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(); val b = ids()
    assert(a == b && a.forall(_ < 1050))
    // null group values fail loud
    val withNull = rows.withColumn("lang",
      when(col("doc_id") === 0, null).otherwise(col("lang")))
    intercept[IllegalArgumentException] {
      Sampling.mixtureSelect(withNull, "lang", "doc_id", Map("big" -> 1.0))
    }
  }

  test("epochMix: full copies exact, fractional copy deterministic, unlisted dropped") {
    import spark.implicits._
    val df = (1L to 400L).map(i =>
      (i, if (i % 4 == 0) "small" else "big")).toDF("doc_id", "lang")
    val out = Sampling.epochMix(df, "lang", "doc_id",
      Map("small" -> 2.5, "big" -> 1.0))
    val rows = out.select("doc_id", "lang", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // (id, epoch) unique
    assert(rows.map(r => (r._1, r._3)).distinct.length == rows.length)
    // big: exactly one copy (epoch 0) per row — e=1.0 has no fractional arm
    val big = rows.filter(_._2 == "big")
    assert(big.length == 300 && big.forall(_._3 == 0L))
    // small: every id has epochs 0 and 1; epoch 2 is the Bernoulli(0.5) arm
    val small = rows.filter(_._2 == "small").groupBy(_._1)
    assert(small.forall { case (_, rs) =>
      val es = rs.map(_._3).sorted.toSeq
      es.startsWith(Seq(0L, 1L)) && es.length <= 3
    })
    val frac = small.values.count(_.exists(_._3 == 2L))
    assert(frac > 25 && frac < 75, s"expected ~50 of 100 third copies, got $frac")
    // deterministic and layout-invariant
    val out2 = Sampling.epochMix(df.repartition(7), "lang", "doc_id",
      Map("small" -> 2.5, "big" -> 1.0))
      .select("doc_id", "lang", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out2.sorted.toSeq == rows.sorted.toSeq)
    // a different seed moves the fractional arm, not the full copies
    val out3 = Sampling.epochMix(df, "lang", "doc_id",
      Map("small" -> 2.5, "big" -> 1.0), seed = 7L)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.filter(_._3 < 2).map(r => (r._1, r._3)).toSet.subsetOf(out3))
    // unlisted groups dropped; targeted-but-absent and bad epochs fail loud
    val noSmall = Sampling.epochMix(df, "lang", "doc_id", Map("big" -> 1.0))
    assert(noSmall.where(col("lang") === "small").count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.epochMix(df, "lang", "doc_id", Map("missing" -> 2.0)).count()
    }
    intercept[IllegalArgumentException] {
      Sampling.epochMix(df, "lang", "doc_id", Map("big" -> 0.0)).count()
    }
    intercept[IllegalArgumentException] {
      Sampling.epochMix(df.withColumn("epoch", lit(1)), "lang", "doc_id",
        Map("big" -> 1.0)).count()
    }
  }

  test("dsir: target-resembling docs outrank the rest; exact dyadic weights; null text excluded") {
    // target: fruit vocabulary; raw: half fruit-ish, half machinery
    val target = Seq.tabulate(20)(i =>
      (1000L + i, "apple banana cherry date apple banana cherry"))
      .toDF("doc_id", "text")
    val raw = (Seq.tabulate(10)(i =>
        (i.toLong, Some("apple banana cherry date fig grape"))) ++
      Seq.tabulate(10)(i =>
        (100L + i, Some("gearbox piston flange torque manifold crankshaft"))) ++
      Seq((999L, Option.empty[String]))).toDF("doc_id", "text")
    val sel = Sampling.dsirSelect(raw, target, "text", "doc_id", k = 10)
      .collect()
    val ids = sel.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.toSet == (0 until 10).map(_.toLong).toSet,
      s"fruit docs must win: $ids")
    // log_weight is the dyadic integer / 2^20 exactly
    val m = Sampling.dsirLogRatios(raw, target, "text")
    val scored = Sampling.dsirScore(raw, "text", m)
      .where(col("__wnum").isNotNull)
      .select(col("doc_id"), col("__wnum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sel.foreach { r =>
      val w = r.getAs[Double]("log_weight")
      assert(w == scored(r.getAs[Long]("doc_id")).toDouble / 1048576.0d)
    }
    // fruit docs strictly outweigh machinery docs
    assert((0 until 10).map(i => scored(i.toLong)).min >
      (0 until 10).map(i => scored(100L + i)).max)
    // null text never enters the ranking
    assert(!scored.contains(999L) && !ids.contains(999L))
    // model covers every bucket; determinism across partitionings
    assert(m.keySet == (0 until 64).toSet)
    assert(Sampling.dsirLogRatios(raw.repartition(7), target.coalesce(1), "text") == m)
    // ties break by id: k larger than the distinct-weight classes
    val sel15 = Sampling.dsirSelect(raw, target, "text", "doc_id", k = 15)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(sel15 == ((0L until 10L) ++ (100L until 105L)),
      s"weight-desc then id-asc: $sel15")
  }

  test("deterministicShuffle: dense 1..n ranks equal to the hash sort order") {
    val out = Sampling.deterministicShuffle(docs, "doc_id", seed = 42L)
      .select("doc_id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.count()
    assert(out.map(_._2).sorted.toSeq == (1L to n).toSeq, "ranks must be dense 1..n")
    // exact expected order: driver-side sort by (md5("id:42"), id)
    def m(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = out.map(_._1).sortBy(id => (m(id), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, r) =>
      assert(r == expected(id), s"doc $id: rank $r != ${expected(id)}")
    }
  }

  test("deterministicShuffle is invariant to input partitioning") {
    val a = Sampling.deterministicShuffle(docs, "doc_id")
      .select("doc_id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.deterministicShuffle(
        docs.repartition(7, col("lang")), "doc_id", numPartitions = 3)
      .select("doc_id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "ranks must not depend on physical layout or partition count")
  }

  test("tokenBudgetSelect: exact prefix of the shuffle order by running sum") {
    val weighted = docs.select(col("doc_id"), col("n_chars"))
    val total = weighted.agg(sum("n_chars")).collect()(0).getLong(0)
    val budget = total / 3
    val out = Sampling.tokenBudgetSelect(weighted, "doc_id", "n_chars", budget)
      .select("doc_id", "running_total").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // driver-side expectation: walk ids in (md5("id:42"), id) order
    def m(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val rows = weighted.collect().map(r => (r.getLong(0), r.getLong(1)))
    var acc = 0L
    val expected = rows.sortBy { case (id, _) => (m(id), id) }
      .flatMap { case (id, wgt) =>
        acc += wgt
        if (acc <= budget) Some(id -> acc) else None
      }.toMap
    assert(out == expected, s"${out.size} kept vs ${expected.size} expected")
    assert(out.nonEmpty && out.size < rows.length)
  }

  test("tokenBudgetSelect: deterministic, layout-invariant, walk order append-stable") {
    val weighted = docs.select(col("doc_id"), col("n_chars"))
    val budget = 20000L
    val a = Sampling.tokenBudgetSelect(weighted, "doc_id", "n_chars", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.tokenBudgetSelect(
        weighted.repartition(7, col("doc_id")), "doc_id", "n_chars", budget,
        numPartitions = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "selection must not depend on physical layout")
    // append-stability of the WALK ORDER: the shuffle rank order of a
    // subset is the full corpus' order restricted to that subset
    val fullOrder = Sampling.deterministicShuffle(weighted, "doc_id")
      .orderBy("shuffle_rank").select("doc_id")
      .collect().map(_.getLong(0)).filter(_ % 2 == 0)
    val halfOrder = Sampling.deterministicShuffle(
        weighted.where(col("doc_id") % 2 === 0), "doc_id")
      .orderBy("shuffle_rank").select("doc_id")
      .collect().map(_.getLong(0))
    assert(fullOrder.toSeq == halfOrder.toSeq)
  }

  test("tokenBudgetPerGroup: per-group running-sum caps with overrides") {
    val weighted = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val out = Sampling.tokenBudgetPerGroup(weighted, "lang", "doc_id",
        "n_chars", budget = 5000L, overrides = Map("en" -> 12000L))
      .select("doc_id", "lang", "running_total").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def m(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val rows = weighted.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      val cap = if (g == "en") 12000L else 5000L
      var acc = 0L
      rs.sortBy { case (id, _, _) => (m(id), id) }.toSeq
        .flatMap { case (id, _, wgt) =>
          acc += wgt
          if (acc <= cap) Some((id, g, acc)) else None
        }
    }.toSet
    assert(out.toSet == expected, s"${out.length} kept vs ${expected.size} expected")
    // the en override must actually bind: more en chars kept than any default group
    val perGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    assert(perGroup("en") > 5000L, s"override not applied: $perGroup")
  }

  test("prefix-sum operators: empty input and degenerate budgets") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")
    assert(Sampling.deterministicShuffle(empty, "doc_id").count() == 0)
    assert(Sampling.tokenBudgetSelect(empty, "doc_id", "n_chars", 100L).count() == 0)
    // budget 0 keeps nothing (weights positive), budget >= total keeps all
    val weighted = docs.select(col("doc_id"), col("n_chars"))
    assert(Sampling.tokenBudgetSelect(weighted, "doc_id", "n_chars", 0L).count() == 0)
    val total = weighted.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(Sampling.tokenBudgetSelect(weighted, "doc_id", "n_chars", total).count()
      == weighted.count())
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSelect(weighted, "doc_id", "n_chars", -1L)
    }
  }

  test("tokenBudgetPerGroup rejects null groups loudly") {
    val withNull = docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, null).otherwise(col("lang")).as("lang"),
      col("n_chars"))
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerGroup(withNull, "lang", "doc_id", "n_chars", 5000L)
    }
    assert(e.getMessage.contains("null values in group column"))
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

  test("leakageSafeSplit: families never straddle the boundary; singletons == hashSplit") {
    val d = docs.select("doc_id", "text")
    val fr = Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1))
    val split = Sampling.leakageSafeSplit(d, "text", "doc_id", fr)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(split.size == d.count())
    val fams = graft.operators.Dedup.nearDupClusters(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fams.nonEmpty, "fixture must contain near-dup families")
    // the whole point: every member of a family gets the same side
    fams.groupBy(_._2).foreach { case (c, ms) =>
      val sides = ms.map(m => split(m._1)).toSet
      assert(sides.size == 1, s"family $c straddles the boundary: $sides")
    }
    // and the family side is the MIN MEMBER's hashSplit side, so docs
    // outside any family split exactly as plain hashSplit
    val plain = Sampling.hashSplit(d.select("doc_id"), "doc_id", fr)
      .collect().map(r => (r.getLong(0), r.getAs[String]("split"))).toMap
    val inFam = fams.map(_._1).toSet
    split.foreach { case (id, s) =>
      if (!inFam(id)) assert(plain(id) == s, s"singleton $id diverged")
    }
    fams.groupBy(_._2).foreach { case (c, ms) =>
      assert(split(ms.head._1) == plain(c), s"family $c not keyed by min member")
    }
  }

  test("mixReport: dropped/synthesized groups, weight sums, shares and ratios") {
    val before = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "c", 7L)
    ).toDF("doc_id", "grp", "w")
    // stage dropped c, duplicated doc 1 (epoch-style), added group d
    val after = Seq(
      (1L, "a", 10L), (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L),
      (9L, "d", 3L)
    ).toDF("doc_id", "grp", "w")
    val out = Sampling.mixReport(before, after, "grp", weightCol = Some("w"))
      .collect().map { r =>
        r.getString(r.fieldIndex("grp")) -> (
          r.getLong(r.fieldIndex("n_before")), r.getLong(r.fieldIndex("n_after")),
          r.getDouble(r.fieldIndex("share_before")), r.getDouble(r.fieldIndex("share_after")),
          if (r.isNullAt(r.fieldIndex("keep_ratio"))) None
          else Some(r.getDouble(r.fieldIndex("keep_ratio"))))
      }.toMap
    assert(out("a") == ((2L, 3L, 0.5, 0.6, Some(1.5))))
    assert(out("b") == ((1L, 1L, 0.25, 0.2, Some(1.0))))
    assert(out("c") == ((1L, 0L, 0.25, 0.0, Some(0.0))))
    assert(out("d") == ((0L, 1L, 0.0, 0.2, None)))
    // weight sums ride along per side; absent side stays null
    val ws = Sampling.mixReport(before, after, "grp", weightCol = Some("w"))
      .collect().map { r =>
        r.getString(r.fieldIndex("grp")) -> (
          if (r.isNullAt(r.fieldIndex("w_before"))) None else Some(r.getLong(r.fieldIndex("w_before"))),
          if (r.isNullAt(r.fieldIndex("w_after"))) None else Some(r.getLong(r.fieldIndex("w_after"))))
      }.toMap
    assert(ws("a") == ((Some(30L), Some(40L))))
    assert(ws("c") == ((Some(7L), None)))
    assert(ws("d") == ((None, Some(3L))))
  }

  test("kCenterSelect: exact greedy law, margins, non-increasing radii") {
    import graft.operators.{Sampling, Similarity}
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Sampling.kCenterSelect(e, "embedding", "vec_id", k = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(out.map(_._1).toSeq == (0 until 6))
    assert(out(0)._3.isNaN) // rank-0 radius is null
    // radii non-increasing (the greedy invariant)
    val radii = out.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b }, radii.toSeq)
    // brute-force recheck of every selection + the cross-engine margin:
    // the winner must beat the runner-up by far more than a cosine ulp
    val vecs = e.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var centers = Vector(vecs(out(0)._2))
    assert(out(0)._2 == vecs.keys.min)
    out.drop(1).foreach { case (_, id, rad) =>
      val minD = vecs.view.mapValues(v => centers.map(c => 1.0 - cos(v, c)).min).toMap
      val best = minD.maxBy { case (i, d) => (d, -i) }
      assert(best._1 == id, s"greedy picked $id, brute force $best")
      assert(math.abs(best._2 - rad) < 1e-9)
      val runnerUp = (minD - id).values.max
      assert(best._2 - runnerUp > 1e-5,
        s"selection margin ${best._2 - runnerUp} too thin for cross-engine argmax trust")
      centers :+= vecs(id)
    }
  }

  test("kCenterSelect: sampled path runs the same greedy over the hash sample; cap >= n is exact") {
    import graft.operators.Sampling
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = e.count().toInt
    val exact = Sampling.kCenterSelect(e, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // a cap covering the whole corpus reproduces the exact path
    val full = Sampling.kCenterSelect(e, "embedding", "vec_id", k = 5,
      sampleCap = n + 10).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(full == exact)
    // a bounded cap still yields k spread rows, deterministically
    val s1 = Sampling.kCenterSelect(e, "embedding", "vec_id", k = 5, sampleCap = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val s2 = Sampling.kCenterSelect(e.repartition(7), "embedding", "vec_id",
      k = 5, sampleCap = 64).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(s1 == s2 && s1.size == 5)
  }

  test("curriculumOrder: bands track score quantiles, order contiguous per band, deterministic") {
    import graft.operators.Sampling
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("text").isNotNull).withColumn("__score", tokenCount(col("text")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.curriculumOrder(df, "__score", "doc_id", nBands = 4)
        .select("doc_id", "band", "curriculum_order", "__score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val out = run(docs)
    val n = out.length
    // one global dense order
    assert(out.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // bands ordered: every band-b order precedes every band-(b+1) order
    val byBand = out.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    for (b <- 0 until 3 if byBand.contains(b) && byBand.contains(b + 1))
      assert(byBand(b).max < byBand(b + 1).min, s"band $b overlaps ${b + 1}")
    // scores never decrease across band boundaries (equal-frequency cuts)
    val maxScore = out.groupBy(_._2).view.mapValues(_.map(_._4).max).toMap
    val minScore = out.groupBy(_._2).view.mapValues(_.map(_._4).min).toMap
    for (b <- 0 until 3 if maxScore.contains(b) && minScore.contains(b + 1))
      assert(maxScore(b) <= minScore(b + 1))
    // partitioning-independent
    assert(run(docs.repartition(11)).sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // nBands = 1 degenerates to the deterministic shuffle order
    val flat = Sampling.curriculumOrder(docs, "__score", "doc_id", nBands = 1)
      .select("doc_id", "curriculum_order").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val shuf = Sampling.deterministicShuffle(docs, "doc_id")
      .select("doc_id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flat == shuf)
  }

  test("stratifiedSplit: per-group proportions exact to rounding; two-phase (no global window)") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("text").isNotNull).select("doc_id", "lang")
    val out = Sampling.stratifiedSplit(docs, "lang", "doc_id",
      Seq(("train", 8), ("valid", 1), ("test", 1)))
    val byLang = out.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = byLang.keys.map(_._1).toSet
    langs.foreach { l =>
      val n = Seq("train", "valid", "test").map(sp => byLang.getOrElse((l, sp), 0L)).sum
      // exact integer cuts: train = floor(0.8n) etc. (boundaries at 8/10, 9/10)
      assert(byLang.getOrElse((l, "train"), 0L) == n * 8 / 10, s"$l train")
      assert(byLang.getOrElse((l, "train"), 0L) + byLang.getOrElse((l, "valid"), 0L)
        == n * 9 / 10, s"$l train+valid")
    }
    // deterministic across partitioning
    val a = out.collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    val b = Sampling.stratifiedSplit(docs.repartition(9), "lang", "doc_id",
      Seq(("train", 8), ("valid", 1), ("test", 1)))
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    assert(a == b)
    // the plan stays two-phase: no global window
    assert(graft.plans.PlanLint.lint(out).isEmpty,
      graft.plans.PlanLint.lint(out).mkString(", "))
    // null group fails loud
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSplit(
        docs.withColumn("lang", when(col("doc_id") === 1, null).otherwise(col("lang"))),
        "lang", "doc_id", Seq(("a", 1), ("b", 1))).collect()
    }
  }
}
