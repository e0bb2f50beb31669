package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
    * (good rows with the data schema, corrupt raw lines verbatim).
    *
    * Parsed via `from_json` over a text scan rather than the json
    * datasource: the datasource refuses to filter on its corrupt column
    * (SPARK-26228 — the referenced-columns optimization would parse
    * only that column), and papering over it with a cache makes the
    * split legal only while the cache survives. With `from_json` the
    * two views are independent projections of the same line scan — no
    * cache dependence, consumable in any order, any number of times.
    * Blank lines are skipped, matching the json datasource. */
  def readWithCorrupt(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path)
      .where(trim(col("value")) =!= "")
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("__j"))
    val good = parsed.where(col(s"__j.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"__j.$f").as(f)).toSeq: _*)
    val bad = parsed.where(col(s"__j.$CorruptCol").isNotNull)
      .select(col("value").as(CorruptCol))
    (good, bad)
  }

  /** Single-file JSONL sink (the report-sized counterpart of
    * [[Sinks.writeTsv]]; bulk data stays parquet). */
  def write(df: DataFrame, filename: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = filename + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").json(tmp)
    val dir = Paths.get(tmp)
    // Files.list streams hold a directory fd until closed — leak-free
    // via try/finally (a long-lived driver calls this per report file)
    val part = {
      val s = Files.list(dir)
      try s.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
      finally s.close()
    }
    Files.move(part, Paths.get(filename), StandardCopyOption.REPLACE_EXISTING)
    locally {
      val s = Files.list(dir)
      try s.forEach(p => Files.delete(p)) finally s.close()
    }
    Files.delete(dir)
  }
}
