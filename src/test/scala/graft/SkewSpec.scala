package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join / distinct equivalence with the unsalted formulations. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  def bigDf = {
    // heavy skew: 90% of rows share key "hot"
    val rows = (1 to 1000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toLong, s"payload$i")
    }
    rows.toDF("k", "v", "payload")
  }

  def dimDf = Seq(("hot", "HOT"), ("k0", "zero"), ("k3", "three"))
    .toDF("k", "label")

  test("saltedJoin inner equals plain join") {
    val plain = bigDf.join(dimDf, Seq("k"), "inner")
      .select("k", "v", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(bigDf, dimDf, Seq("k"), saltFactor = 8)
      .select("k", "v", "payload", "label")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedJoin left keeps unmatched rows exactly once") {
    val plain = bigDf.join(dimDf, Seq("k"), "left")
      .select("k", "v", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(bigDf, dimDf, Seq("k"), 4, "left")
      .select("k", "v", "label")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    // row count preserved (no duplication from replication)
    assert(Skew.saltedJoin(bigDf, dimDf, Seq("k"), 4, "left").count() == 1000)
  }

  test("distinctCountSalted equals countDistinct") {
    val expected = bigDf.groupBy("k").agg(countDistinct("v").as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Skew.distinctCountSalted(bigDf, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("skewReport surfaces the hot key first") {
    val top = Skew.skewReport(bigDf, Seq("k"), 3).collect()
    assert(top(0).getString(0) == "hot")
    assert(top(0).getDouble(2) > 0.8)
  }
}
