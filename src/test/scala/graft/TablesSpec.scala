package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.normalizeTs must accept every `ts` physical layout the harness
  * testdata has shipped (nanosecond longs under the legacy parquet flag,
  * micros TIMESTAMP, TIMESTAMP_NTZ) and produce the identical
  * session-local timestamp column for the same instants. */
class TablesSpec extends SparkSpec {

  // 2024-03-01T12:34:56.789012 UTC in micros
  private val micros = Seq(1709296496789012L, 1709296496000000L, 0L)

  test("normalizeTs: nanos-long and timestamp layouts yield identical instants") {
    import spark.implicits._
    val fromLong = Tables.normalizeTs(
      micros.map(_ * 1000L).toDF("ts")) // nanosecond longs
    val fromTs = Tables.normalizeTs(
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))
    val a = fromLong.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val b = fromTs.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq == micros.sorted)
  }

  test("normalizeTs: TIMESTAMP_NTZ is cast through, not rejected") {
    import spark.implicits._
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.count() == micros.length)
  }

  test("normalizeTs: an unsupported ts type fails loudly") {
    import spark.implicits._
    val bad = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("unsupported events.ts type"))
  }
}
