package graft

import org.apache.spark.sql.functions._
import graft.core.{CheckpointStore, Transformer}
import java.util.concurrent.atomic.AtomicInteger

/** Fingerprint-keyed checkpoint cache (reference cache semantics,
  * mdataframe.py:208-230/311-317): hit skips recompute, parameter change
  * invalidates, input-key change invalidates. */
class CheckpointStoreSpec extends SparkSpec {

  import spark.implicits._

  test("cache hit skips executing the transformer; key changes invalidate") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val store = CheckpointStore(dir)
    val executions = CheckpointStoreSpec.executions
    executions.set(0)

    def mkT(factor: Double) = Transformer("scaleBy", Seq(factor)) { df =>
      CheckpointStoreSpec.executions.incrementAndGet()
      df.withColumn("v", col("v") * factor)
    }
    def input = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")

    val t2 = mkT(2.0)
    val r1 = store(t2, input, "fixture-v1").orderBy("id").collect().map(_.getDouble(1))
    assert(r1.toSeq == Seq(4.0, 6.0))
    assert(executions.get() == 1)

    // same transformer + same input key → cache hit, no execution
    val r2 = store(t2, input, "fixture-v1").orderBy("id").collect().map(_.getDouble(1))
    assert(r2.toSeq == Seq(4.0, 6.0))
    assert(executions.get() == 1, "second call must hit the cache")

    // equal params, different instance → same fingerprint → still a hit
    store(mkT(2.0), input, "fixture-v1").collect()
    assert(executions.get() == 1)

    // parameter change → new fingerprint → recompute
    val r3 = store(mkT(3.0), input, "fixture-v1").orderBy("id").collect().map(_.getDouble(1))
    assert(r3.toSeq == Seq(6.0, 9.0))
    assert(executions.get() == 2)

    // input-version change → recompute
    store(t2, input, "fixture-v2").collect()
    assert(executions.get() == 3)
  }
}

object CheckpointStoreSpec {
  /** JVM-wide counter so executor-side increments are visible in
    * local-mode tests. */
  val executions = new AtomicInteger(0)
}
