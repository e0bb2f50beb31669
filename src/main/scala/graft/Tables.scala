package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Readers for the harness test tables (TESTDATA.md) and shared helpers for
  * oracle-exact arithmetic. */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** events.parquet has shipped with two `ts` physical types across harness
    * versions: TIMESTAMP(NANOS) (read as nanosecond longs under the legacy
    * flag) and plain TIMESTAMP(MICROS). Branch on the type actually read so
    * both layouts load identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  /** ts → session-local TIMESTAMP regardless of the stored type. Works on
    * batch and streaming frames alike (pure projection). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // INTEGER division: `/` on longs is double division in Spark, and
        // 2024-era nanosecond epochs (~1.7e18) exceed double's 2^53 exact
        // range — the rounding error shifts some timestamps by ±1 µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }
  /** documents/embeddings arrive as one small parquet file → ONE input
    * partition; the text/vector operators do heavy per-row work, so spread
    * the rows across the configured parallelism up front (results are
    * order-insensitive; every query re-sorts). */
  private def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
  def documents(s: SparkSession, d: String): DataFrame = spread(s, table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = spread(s, table(s, d, "embeddings"))

  /** Exact-sum helper for oracle parity: floating-point sums are
    * order-dependent, so a distributed Spark sum and a DuckDB sum of the same
    * doubles can differ in the last ulps — enough to break hash comparison.
    * The test doubles are all low-scale decimal values, so `cast(x as
    * decimal(18,s))` is unambiguous in both engines; decimal summation is
    * exact; the final cast back to double is then bit-identical everywhere.
    * Oracle SQL must apply the same shape:
    * `cast(sum(cast(x as decimal(18,s))) as double)`. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal cast used inside product expressions. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** [[dsum]] at maximum decimal width (38 digits): for terms that can
    * carry quadratic feature products (e.g. the IRLS Gram sums over
    * token-count²), where 12 integer digits would overflow — and under
    * ANSI-off semantics an overflowing cast yields NULL, silently
    * DROPPING that row from the aggregate rather than failing loudly.
    * Oracle SQL must mirror the width: `cast(x as decimal(38,s))`. */
  def dsumWide(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")
}
