package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Filter, FilterClause}
import graft.functions.BhFdr

/** Property tests (SURVEY.md §5 plan): the filter DSL is equivalent to a
  * direct pandas-semantics evaluation on random frames (NaN/null
  * comparisons are false; `notin` keeps nulls), and BH-FDR matches a
  * pure-Scala transcription of R's p.adjust("BH") with its structural
  * properties. */
class FilterPropertySpec extends AnyFunSuite {

  private def checkProp(prop: Prop, min: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  lazy val spark = SparkSpec.spark

  // ---- reference evaluation of one clause on a plain Scala row ----
  private def pandasElem(v: Option[Double], op: String, arg: Double): Boolean = v match {
    case None => op == "notin" // NaN: comparisons false; ~isin true
    case Some(x) => op match {
      case "|>" => math.abs(x) > arg
      case ">" => x > arg
      case "<" => x < arg
      case ">=" => x >= arg
      case "<=" => x <= arg
      case "in" => x == arg
      case "notin" => x != arg
    }
  }

  private def pandasClause(row: Map[String, Option[Double]], c: TestClause): Boolean = {
    val hits = c.cols.count(col => pandasElem(row(col), c.op, c.arg))
    if (c.atLeast == "a") hits == c.cols.size else hits >= c.atLeast.toInt
  }

  case class TestClause(cols: Seq[String], op: String, arg: Double, atLeast: String) {
    // the reference quantifies comparison ops via the "2>=" prefix form
    // (filter.py regex allows only [<>=]+ there) and everything via the
    // explicit 4-tuple at_least; exercise both surfaces
    def toFilterClause: FilterClause =
      if (atLeast == "1") FilterClause(cols, op, arg)
      else if (Seq(">", "<", ">=", "<=").contains(op) && atLeast != "a")
        FilterClause(cols, s"$atLeast$op", arg)
      else FilterClause(cols, op, arg, Some(atLeast))
  }

  val colNames = Seq("c0", "c1", "c2")
  val genValue: Gen[Option[Double]] =
    Gen.frequency(8 -> Gen.chooseNum(-5, 5).map(v => Some(v.toDouble)), 1 -> Gen.const(None))
  val genRow: Gen[Seq[Option[Double]]] = Gen.listOfN(3, genValue)
  val genClause: Gen[TestClause] = for {
    nCols <- Gen.choose(1, 3)
    cols <- Gen.pick(nCols, colNames)
    op <- Gen.oneOf("|>", ">", "<", ">=", "<=", "in", "notin")
    arg <- Gen.chooseNum(-4, 4).map(_.toDouble)
    atLeast <- Gen.oneOf(Gen.const("a"), Gen.choose(1, nCols).map(_.toString))
  } yield TestClause(cols.toSeq, op, arg, atLeast)

  test("filter DSL ≡ pandas-semantics direct evaluation (random frames + clauses)") {
    val schema = StructType(
      StructField("id", IntegerType) +: colNames.map(StructField(_, DoubleType)))
    val genClauses = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genClause))
    val prop = Prop.forAll(Gen.listOfN(30, genRow), genClauses) {
      (rows, clauses) =>
        val data = rows.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(i +: r.map(_.map(Double.box).orNull))
        }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data, 2), schema)
        val f = Filter(clauses.map(_.toFilterClause))
        val got = f(df).select("id").collect().map(_.getInt(0)).toSet
        val expect = rows.zipWithIndex.filter { case (r, _) =>
          val m = colNames.zip(r).toMap
          clauses.forall(c => pandasClause(m, c))
        }.map(_._2).toSet
        got == expect
    }
    checkProp(prop, 40)
  }

  test("filter algebra: & is intersection, | is union (random predicates)") {
    val schema = StructType(
      StructField("id", IntegerType) +: colNames.map(StructField(_, DoubleType)))
    val prop = Prop.forAll(Gen.listOfN(25, genRow), genClause, genClause) {
      (rows, c1, c2) =>
        val data = rows.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(i +: r.map(_.map(Double.box).orNull))
        }
        val df = spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
        val f1 = Filter(Seq(c1.toFilterClause))
        val f2 = Filter(Seq(c2.toFilterClause))
        def ids(d: org.apache.spark.sql.DataFrame) =
          d.select("id").collect().map(_.getInt(0)).toSet
        val s1 = ids(f1(df)); val s2 = ids(f2(df))
        ids((f1 & f2)(df)) == s1.intersect(s2) && ids((f1 | f2)(df)) == s1.union(s2)
    }
    checkProp(prop, 30)
  }

  // ---- BH-FDR ----

  /** R p.adjust(method="BH") transcription. */
  private def bhReference(ps: Array[Double]): Array[Double] = {
    val n = ps.length
    val order = ps.zipWithIndex.sortBy(-_._1) // descending
    val adj = new Array[Double](n)
    var running = Double.MaxValue
    order.zipWithIndex.foreach { case ((p, idx), k) =>
      val rank = n - k
      running = math.min(running, p * n / rank)
      adj(idx) = math.min(running, 1.0)
    }
    adj
  }

  test("BH-FDR window formulation matches R p.adjust (random p-vectors, ties included)") {
    import spark.implicits._
    val genPs = Gen.listOfN(60,
      Gen.frequency(5 -> Gen.choose(0.0, 1.0), 2 -> Gen.oneOf(0.01, 0.5, 0.05)))
    val prop = Prop.forAll(genPs) { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "p")
      val expect = bhReference(ps.toArray)
      val gotW = BhFdr.adjust(df, "p", "fdr")
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
      val gotD = BhFdr.adjustDistributed(df, "p", "fdr", smallCutoff = 0L)
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
      ps.indices.forall { i =>
        math.abs(gotW(i) - expect(i)) < 1e-12 && math.abs(gotD(i) - expect(i)) < 1e-12
      }
    }
    checkProp(prop, 15)
  }
}
