package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.chaining._

/** JSON-Lines source/sink — the de-facto interchange format of LLM
  * training corpora (one JSON document per line; WebDataset/Dolma/
  * RedPajama all ship this shape). Additive to the reference's TSV/Excel
  * source family (SURVEY.md §2.1 S5).
  *
  * Reading at 100 TB hinges on two things Spark gives for free when
  * driven correctly:
  *   - an EXPLICIT schema: schema inference reads the whole input once
  *     before the real scan — `read` here requires the schema so the
  *     data is read exactly once (and column pruning still reaches the
  *     JSON parser via nested-schema pruning);
  *   - quarantine, not abort: a trillion-line crawl WILL contain broken
  *     lines. PERMISSIVE mode + a corrupt-record column routes them to
  *     a side channel ([[readWithCorrupt]]) so the pipeline keeps its
  *     throughput and the broken payloads stay auditable.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read with an explicit schema; malformed lines are DROPPED
    * (DROPMALFORMED) — the "screened ingest" default. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)

  /** Read with an explicit schema, quarantining malformed lines: returns
    * (good rows with the data schema, corrupt raw lines). One scan
    * definition; Spark caches requirement: the corrupt column must be
    * materialized before filtering on it, hence the cache-free two-view
    * split over one source plan. */
  def readWithCorrupt(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // Spark refuses to filter directly on the corrupt column of a
      // json scan (SPARK-26228: the referenced-columns optimization
      // would parse only the corrupt column); materialize the split
      // through a retained cache of the narrow two-column projection
      .pipe(graft.core.CacheScope.retain)
    val good = raw.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.where(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (good, bad)
  }

  /** Single-file JSONL sink (the report-sized counterpart of
    * [[Sinks.writeTsv]]; bulk data stays parquet). */
  def write(df: DataFrame, filename: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = filename + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").json(tmp)
    val dir = Paths.get(tmp)
    val part = Files.list(dir).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    Files.move(part, Paths.get(filename), StandardCopyOption.REPLACE_EXISTING)
    Files.list(dir).forEach(p => Files.delete(p))
    Files.delete(dir)
  }
}
