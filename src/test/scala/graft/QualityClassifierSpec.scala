package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Ridge-IRLS logistic quality classifier: layout-invariant fit,
  * separable-rule learning, sigmoid/linear decision parity, degenerate
  * inputs. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = Tables.documents(spark, "/root/testdata/sf0.001")
    .withColumn("label",
      (graft.functions.TextFunctions.tokenCount(col("text")) >= 40).cast("int"))

  test("fit is partitioning-invariant (exact-decimal Gram aggregates)") {
    val a = QualityClassifier.fit(labeled.repartition(13), "text", "label")
    val b = QualityClassifier.fit(labeled.coalesce(1), "text", "label")
    assert(a == b, s"layout changed the fit: $a vs $b")
  }

  test("learns a separable token-count rule with high accuracy") {
    val model = QualityClassifier.fit(labeled, "text", "label")
    val scored = labeled.select(col("label"),
      (model.linearScore(col("text")) >= 0).cast("int").as("pred"))
    val (n, correct) = (scored.count(),
      scored.where(col("label") === col("pred")).count())
    assert(correct.toDouble / n >= 0.95,
      s"accuracy ${correct.toDouble / n} on a linearly separable rule")
    // the rule is driven by the token-count feature
    assert(model.weights.head > 0, s"n_tokens weight not positive: $model")
  }

  test("sigmoid threshold at 1/2 equals linear threshold at 0") {
    val model = QualityClassifier.fit(labeled, "text", "label")
    val diff = labeled.select(
      ((model.score(col("text")) >= 0.5) =!= (model.linearScore(col("text")) >= 0))
        .as("d"))
      .where(col("d")).count()
    assert(diff == 0)
  }

  test("degenerate inputs: null labels dropped, null text zero-featured, constant feature caught") {
    val rows = Seq(
      (1L, Some("short one"), Some(0)),
      (2L, Some("a much longer document with many more tokens in the stream here"), Some(1)),
      (3L, Option.empty[String], Some(0)),
      (4L, Some("dropped row"), Option.empty[Int])
    ).toDF("doc_id", "text", "label")
    // fits without error; null text contributes all-zero features
    val m = QualityClassifier.fit(rows, "text", "label", iters = 4)
    assert(m.weights.forall(w => !w.isNaN && !w.isInfinite))
    // an all-constant corpus makes the token feature collinear with the
    // intercept — ridge keeps the system solvable; ridge 0 must fail LOUD
    val const = Seq((1L, "same same", 0), (2L, "same same", 1))
      .toDF("doc_id", "text", "label")
    val ok = QualityClassifier.fit(const, "text", "label", iters = 2)
    assert(ok.weights.forall(w => !w.isNaN && !w.isInfinite))
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(const, "text", "label", iters = 2, ridge = 0.0)
    }
    // zero labeled rows must name the real cause, not surface as the
    // misleading "singular IRLS system" from null→0.0 aggregate cells
    val unlabeled = Seq((1L, "some text", Option.empty[Integer]),
      (2L, "more text", Option.empty[Integer])).toDF("doc_id", "text", "label")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.fit(unlabeled, "text", "label", iters = 2)
    }
    assert(e.getMessage.contains("no labeled rows"))
  }
}
