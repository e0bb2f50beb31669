package graft

import graft.operators.Eval
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private val scored = Seq(
    (0.9, 1), (0.8, 0), (0.6, 1), (0.4, 1), (0.2, 0), (0.1, 0)
  ).toDF("score", "label")

  test("prCurve: hand-checked confusion counts and ratios") {
    val got = Eval.prCurve(scored, "score", "label", Seq(0.5, 0.95))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // t=0.5: predicted pos {0.9,0.8,0.6} -> tp=2 fp=1; neg {0.4,0.2,0.1} -> fn=1 tn=2
    // t=0.95: nothing predicted positive
    assert(got == List((0.5, 2L, 1L, 1L, 2L), (0.95, 0L, 0L, 3L, 3L)))
    val r05 = Eval.prCurve(scored, "score", "label", Seq(0.5)).collect()(0)
    assert(r05.getDouble(5) == 2.0 / 3.0) // precision
    assert(r05.getDouble(6) == 2.0 / 3.0) // recall
    assert(r05.getDouble(7) == 4.0 / 6.0) // f1 = 2tp/(2tp+fp+fn)
  }

  test("prCurve: NULL precision when nothing predicted positive; null rows excluded") {
    val r = Eval.prCurve(scored, "score", "label", Seq(0.95)).collect()(0)
    assert(r.isNullAt(5), "precision must be NULL at an empty prediction set")
    assert(r.getDouble(6) == 0.0) // recall 0/3
    val withNulls = scored.unionByName(
      Seq((Option.empty[Double], Option(1)), (Option(0.7), Option.empty[Int]))
        .toDF("score", "label"))
    val a = Eval.prCurve(withNulls, "score", "label", Seq(0.5)).collect()(0)
    val b = Eval.prCurve(scored, "score", "label", Seq(0.5)).collect()(0)
    assert(a.toSeq == b.toSeq, "null score/label rows must not count")
  }

  test("calibration: bin placement incl. the score == 1.0 edge, exact means") {
    val d = Seq((0.0, 0), (0.05, 1), (0.95, 1), (1.0, 1)).toDF("score", "label")
    val got = Eval.calibration(d, "score", "label", bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4))).toList
    // bin 0: scores 0.0, 0.05 (one pos); bin 9: 0.95 and 1.0 (clamped), both pos
    assert(got == List((0L, 2L, 1L, 0.5), (9L, 2L, 2L, 1.0)))
  }

  test("prCurve rejects duplicate thresholds") {
    intercept[IllegalArgumentException] {
      Eval.prCurve(scored, "score", "label", Seq(0.5, 0.5))
    }
  }
}
