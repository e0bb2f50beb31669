package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 0L, 10L),    // overlaps r1, r2
    (2L, 9L, 12L),    // overlaps r1(no: r1 ends at 9? half-open), r2
    (3L, 100L, 612L), // long interval spanning many bins; overlaps r3
    (4L, 50L, 50L),   // empty — dropped
    (5L, 20L, 25L)    // overlaps nothing
  ).toDF("lid", "ls", "le")

  private val right = Seq(
    (1L, 5L, 9L),
    (2L, 9L, 11L),
    (3L, 600L, 700L),
    (4L, 4000L, 4100L)
  ).toDF("rid", "rs", "re")

  private def pairs(bin: Long): Set[(Long, Long, Long)] =
    Intervals.overlapJoin(left, right, "ls", "le", "rs", "re", bin)
      .select("lid", "rid", "overlap_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val expected = Set(
    (1L, 1L, 4L),  // [5,9) in [0,10)
    (1L, 2L, 1L),  // [9,10) ∩ [9,11)
    (2L, 2L, 2L),  // [9,12) ∩ [9,11) = [9,11)
    (3L, 3L, 12L)) // [100,612) ∩ [600,700) = [600,612)

  test("overlapJoin: exact half-open semantics, hand-checked") {
    assert(pairs(8) == expected)
  }

  test("result is bin-size invariant (exactly-once emission at every width)") {
    for (bin <- Seq(1L, 3L, 7L, 64L, 100000L)) {
      assert(pairs(bin) == expected, s"binSize=$bin")
    }
  }

  test("touching endpoints do not overlap (half-open) and empty intervals drop") {
    // r1 = [5,9) vs l2 = [9,12): share coordinate 9 only — NOT a pair
    assert(!pairs(8).exists { case (l, r, _) => l == 2L && r == 1L })
    // empty l4 never appears
    assert(!pairs(8).exists(_._1 == 4L))
  }

  test("plan is an equi-join on the bin key, not a nested-loop join") {
    val physical = Intervals.overlapJoin(left, right, "ls", "le", "rs", "re", 8)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$physical")
  }

  test("coverageCount includes 0-covered right rows") {
    val got = Intervals.coverageCount(left, right, "ls", "le", "rs", "re",
        "rid", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 1L), (2L, 2L), (3L, 1L), (4L, 0L)))
  }

  test("column collisions are rejected") {
    intercept[IllegalArgumentException] {
      Intervals.overlapJoin(left, left, "ls", "le", "ls", "le", 8)
    }
  }

  test("mergeIntervals: runs, touching merge, empty drop — hand-checked") {
    val df = Seq(
      // group 0: [0,5) [3,8) touch-chain [8,10), then isolated [20,25)
      (0L, 0L, 5L), (0L, 3L, 8L), (0L, 8L, 10L), (0L, 20L, 25L),
      // group 1: nested [0,100) contains [10,20); empty [50,50) dropped
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 50L, 50L)
    ).toDF("g", "s", "e")
    val got = Intervals.mergeIntervals(df, "g", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List(
      (0L, 0L, 10L, 3L),
      (0L, 20L, 25L, 1L),
      (1L, 0L, 100L, 2L)))
  }

  test("closest: overlap wins, gaps measured half-open, ties to smaller id") {
    val l = Seq(
      (1L, 0L, 0L, 10L),   // overlaps r1
      (1L, 2L, 40L, 45L),  // gap 5 to r1 (before: 40-35), gap 5 to r2 (after: 50-45) — tie -> r1
      (1L, 3L, 60L, 70L),  // nearest is r2 before: 60-55=5
      (2L, 4L, 5L, 6L)     // group 2 has no rights — omitted
    ).toDF("g", "lid", "ls", "le")
    val r = Seq(
      (1L, 1L, 30L, 35L),
      (1L, 2L, 50L, 55L)
    ).toDF("g", "rid", "rs", "re")
    val got = Intervals.closest(l, r, "g", "lid", "ls", "le",
        "rid", "rs", "re", binSize = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toList
    // lid 0 [0,10) vs r1 [30,35): no overlap — gap 30-10=20; r2 gap 40. closest r1/20
    assert(got == List((0L, 1L, 20L), (2L, 1L, 5L), (3L, 2L, 5L)))
  }

  test("closest: distance 0 reported for containment and partial overlap") {
    val l = Seq((1L, 1L, 10L, 20L), (1L, 2L, 0L, 100L)).toDF("g", "lid", "ls", "le")
    val r = Seq((1L, 7L, 15L, 30L)).toDF("g", "rid", "rs", "re")
    val got = Intervals.closest(l, r, "g", "lid", "ls", "le",
        "rid", "rs", "re", binSize = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toList
    assert(got == List((1L, 7L, 0L), (2L, 7L, 0L)))
  }

  test("closest gate agrees with a driver-side naive argmin at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_interval_closest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val li = Tables.lineitem(spark, dir).where(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        pmod(col("l_orderkey") * 37 + col("l_partkey"), lit(100000L)),
        pmod(col("l_quantity").cast("long") * 13, lit(200L)))
      .collect().map(r => (r.getLong(0), r.getLong(0) % 16, r.getLong(1),
        r.getLong(1) + 1 + r.getLong(2)))
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), pmod(col("p_partkey") * 53, lit(100000L)),
        pmod(col("p_partkey") * 7, lit(300L)))
      .collect().map(r => (r.getLong(0), r.getLong(0) % 16, r.getLong(1),
        r.getLong(1) + 1 + r.getLong(2)))
    // left keys repeat in this synthetic table (l_linenumber is not
    // unique per order): the operator and the oracle both pool the
    // key's candidate sets and report one argmin per KEY — the naive
    // reference must too
    val naive = li.groupBy(_._1).toSeq.flatMap { case (lid, rows) =>
      val g = lid % 16
      val cands = for {
        (_, _, ls, le) <- rows
        (rid, rg, rs, re) <- pt if rg == g
      } yield (rid, math.max(math.max(ls - re, rs - le), 0L))
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (rid, d) => (d, rid) }
        Some((lid, best._1, best._2))
      }
    }.sortBy(_._1).toList
    assert(got == naive)
    assert(naive.nonEmpty)
  }

  test("gate fixture: the binned join agrees with a driver-side naive scan at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_interval_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val li = Tables.lineitem(spark, dir).where(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        pmod(col("l_orderkey") * 37 + col("l_partkey"), lit(100000L)),
        pmod(col("l_quantity").cast("long") * 13, lit(200L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + 1 + r.getLong(2)))
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), pmod(col("p_partkey") * 53, lit(100000L)),
        pmod(col("p_partkey") * 7, lit(300L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + 1 + r.getLong(2)))
    val naive = (for {
      (lid, ls, le) <- li
      (rid, rs, re) <- pt
      if ls < re && rs < le
    } yield (lid, rid, math.min(le, re) - math.max(ls, rs))).toSet
    assert(got == naive)
    assert(naive.nonEmpty)
  }
}
