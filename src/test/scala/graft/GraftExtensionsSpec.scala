package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions
import graft.operators.Similarity

/** Native cosine_sim expression: agrees with the HOF formulation, runs
  * inside whole-stage codegen (no ScalaUDF / no interpreted fallback). */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("cosine_sim matches the expression formulation at 1e-12") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
      (3L, Array(1.0, 2.0, -1.0), Array(-2.0, 0.5, 4.0)),
      (4L, Array(0.5, 0.25, 0.125), Array(8.0, 4.0, 2.0))
    ).toDF("id", "a", "b")
    val out = df
      .withColumn("native", expr("cosine_sim(a, b)"))
      .withColumn("hof", Similarity.cosine(col("a"), col("b")))
      .select("id", "native", "hof").collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12, s"row ${r.getLong(0)}")
    }
    assert(math.abs(out.find(_.getLong(0) == 1L).get.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(out.find(_.getLong(0) == 2L).get.getDouble(1)) < 1e-12)
  }

  test("cosine_sim stays codegen (no ScalaUDF in the plan)") {
    GraftExtensions.register(spark)
    val df = Seq((1L, Array(1.0, 2.0), Array(3.0, 4.0))).toDF("id", "a", "b")
    val plan = df.withColumn("c", expr("cosine_sim(a, b)"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("ScalaUDF"), plan)
    // generated code compiles: force execution through codegen
    val v = df.withColumn("c", expr("cosine_sim(a, b)")).select("c").collect()(0).getDouble(0)
    val expect = (1 * 3 + 2 * 4) / (math.sqrt(5.0) * math.sqrt(25.0))
    assert(math.abs(v - expect) < 1e-12)
  }

  test("jaccard_sorted merge-counts sorted long arrays (codegen, no UDF)") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, Array(1L, 2L, 3L, 9L), Array(2L, 3L, 4L)),
      (2L, Array(1L, 2L), Array(1L, 2L)),
      (3L, Array(1L, 2L), Array(5L, 6L)),
      (4L, Array.empty[Long], Array.empty[Long])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), expr("jaccard_sorted(a, b)").as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 2.0 / 5.0) < 1e-12)
    assert(got(2L) == 1.0)
    assert(got(3L) == 0.0)
    assert(got(4L) == 1.0) // empty vs empty: union 0 → defined as identical
    val plan = df.select(expr("jaccard_sorted(a, b)")).queryExecution.executedPlan.toString()
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("null inputs propagate null") {
    GraftExtensions.register(spark)
    val df = Seq((1L, Option(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("id", "a", "b")
    val v = df.selectExpr("cosine_sim(a, b) AS c").collect()(0)
    assert(v.isNullAt(0))
    assert(df.selectExpr("dot_arr(a, b) AS d").collect()(0).isNullAt(0))
  }

  test("dot_arr: index-order sum, length-mismatch truncation, codegen") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(1.0, 2.0), Array(3.0, 4.0, 5.0)), // truncates to min length
      (3L, Array.empty[Double], Array.empty[Double])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), expr("dot_arr(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1 * 4 + 2 * 5 + 3 * 6.0)
    assert(got(2L) == 1 * 3 + 2 * 4.0)
    assert(got(3L) == 0.0)
    val plan = df.select(expr("dot_arr(a, b)")).queryExecution.executedPlan.toString()
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("hyperplane_sketch / nearest_cells: codegen == interpreted eval, stable ties") {
    import org.apache.spark.sql.GraftColumnBridge
    import graft.plans.{HyperplaneSketchExpr, NearestCellsExpr}
    val planes = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.5), Seq(0.0, -1.0))
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0))
    val df = Seq(
      (1L, Array(2.0, 1.0)),
      (2L, Array(-1.0, -1.0)),
      (3L, Array(0.5, 0.5)) // equidistant to all four centroids: ties → ascending index
    ).toDF("id", "v")
    val out = df.select(col("id"),
      GraftColumnBridge.column(HyperplaneSketchExpr(
        GraftColumnBridge.expression(col("v")), planes)).as("sig"),
      GraftColumnBridge.column(NearestCellsExpr(
        GraftColumnBridge.expression(col("v")), cents, 3)).as("cells"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq)).toList
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    // row 1: dots = (2, -1.5, -1) → only plane 0 positive → bit 0
    assert(byId(1L)._1 == 1L)
    // row 2: dots = (-2, 0.5, 1) → planes 1 and 2 → bits 1+2 = 6
    assert(byId(2L)._1 == 6L)
    // row 3 ties: stable ascending cell order
    assert(byId(3L)._2 == Seq(0, 1, 2))
    // row 1 nearest: (2,1) → d²: c0=5, c1=2, c2=4, c3=1 → order 3,1,2
    assert(byId(1L)._2 == Seq(3, 1, 2))
    // structural equality of the closure state (Seq, not Array): two
    // independently built expressions over equal planes must compare
    // equal or CSE/exchange reuse can never deduplicate them. The same
    // child expression is shared — column nodes carry call-site Origins
    // that differ across col() calls; the field under test is the matrix.
    val childE = GraftColumnBridge.expression(col("v"))
    assert(HyperplaneSketchExpr(childE, planes.map(_.toVector).toVector) ==
      HyperplaneSketchExpr(childE, planes))
    assert(NearestCellsExpr(childE, cents.map(_.toVector).toVector, 3) ==
      NearestCellsExpr(childE, cents, 3))
  }

  test("robots_allowed resolves through the SQL registry; agent defaults and literal form") {
    GraftExtensions.register(spark)
    val robots = "User-agent: *\nAllow: /pub\nDisallow: /\n"
    Seq((1L, robots, "/pub/a"), (2L, robots, "/secret"))
      .toDF("id", "r", "p").createOrReplaceTempView("robots_probe")
    val got = spark.sql(
      "SELECT id, robots_allowed(r, p) AS d, robots_allowed(r, p, 'foobot') AS f " +
      "FROM robots_probe ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, true, true), (2L, false, false)))
    val ex = intercept[Exception] {
      spark.sql("SELECT robots_allowed(r, p, id) FROM robots_probe").collect()
    }
    assert(ex.getMessage.contains("string literal"))
  }
}
