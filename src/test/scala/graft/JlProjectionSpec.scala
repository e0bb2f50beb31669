package graft

import graft.operators.Projection
import org.apache.spark.sql.functions._

class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  /** 200 deterministic pseudo-random 64-dim vectors. The flat index
    * (id·64 + d) times an irrational-ish multiplier decorrelates every
    * coordinate — a single shared frequency across vectors would
    * correlate with the fixed sign matrix and bias the ratio test. */
  private lazy val vecs = spark.range(200).select(col("id"),
    transform(sequence(lit(0), lit(63)),
      d => sin((col("id") * 64 + d) * 1.2345001 + 0.321).cast("float")).as("v"))

  test("scaled projection preserves squared norms in expectation (JL)") {
    val proj = Projection.rademacherProject(vecs, "v", "id", dim = 64, outDim = 16)
    val sq = (c: org.apache.spark.sql.Column) =>
      aggregate(c.cast("array<double>"), lit(0.0), (a, x) => a + x * x)
    val joined = vecs.join(proj, "id")
      .select((sq(col("proj")) / sq(col("v"))).as("ratio"))
    val ratios = joined.collect().map(_.getDouble(0))
    // per-vector distortion has stddev ~ sqrt(2/k) = 0.35 at k=16
    assert(ratios.forall(r => r > 0.15 && r < 3.0),
      s"extreme distortion: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean")
  }

  test("pairwise distances survive within JL distortion on average") {
    val proj = Projection.rademacherProject(vecs, "v", "id", dim = 64, outDim = 16)
    val both = vecs.join(proj, "id")
    val a = both.select(col("id").as("ia"), col("v").as("va"), col("proj").as("pa"))
    val bb = both.select(col("id").as("ib"), col("v").as("vb"), col("proj").as("pb"))
    val d2 = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      aggregate(zip_with(x.cast("array<double>"), y.cast("array<double>"),
        (p, q) => (p - q) * (p - q)), lit(0.0), (acc, e) => acc + e)
    val pairs = a.join(bb, col("ia") + 1 === col("ib"))
      .select((d2(col("pa"), col("pb")) / d2(col("va"), col("vb"))).as("ratio"))
      .collect().map(_.getDouble(0))
    val mean = pairs.sum / pairs.length
    assert(math.abs(mean - 1.0) < 0.2, s"mean distance ratio $mean")
  }

  test("projection is deterministic across partitioning; seed changes it") {
    val p1 = Projection.rademacherProject(vecs.repartition(1), "v", "id", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val p32 = Projection.rademacherProject(vecs.repartition(32), "v", "id", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(p1 == p32)
    val p2 = Projection.rademacherProject(vecs, "v", "id", 64, 16, seed = 2L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(p1 != p2, "a different seed must give a different projection")
  }

  test("plan is map-side: no exchange before the projection") {
    val plan = Projection.rademacherProject(vecs, "v", "id", 64, 16)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan.take(1000))
  }

  test("invalid geometry fails loud") {
    intercept[IllegalArgumentException](
      Projection.rademacherProject(vecs, "v", "id", dim = 64, outDim = 64))
  }
}
