package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Jsonl
import java.nio.file.Files

/** JSONL source/sink: schema-first read, corrupt-line quarantine, and
  * the single-file sink round-trip. */
class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def writeFixture(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-jsonl", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val good = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
    """{"doc_id": 2, "text": "hallo welt", "lang": "de"}""",
    """{"doc_id": 3, "text": "bonjour", "lang": "fr"}""")
  private val broken = Seq(
    """{"doc_id": 4, "text": "truncated...""",
    """not json at all""")

  test("read drops malformed lines; schema is the contract") {
    val path = writeFixture(scala.util.Random.shuffle(good ++ broken))
    val df = Jsonl.read(spark, path, schema)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text", "lang"))
    assert(df.count() == 3)
    assert(df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("readWithCorrupt quarantines malformed lines verbatim") {
    val path = writeFixture(good ++ broken)
    val (ok, bad) = Jsonl.readWithCorrupt(spark, path, schema)
    assert(ok.count() == 3)
    assert(ok.schema.fieldNames.toSeq == Seq("doc_id", "text", "lang"),
      "corrupt column must not leak into the good side")
    val badLines = bad.collect().map(_.getString(0)).toSet
    assert(badLines == broken.toSet, s"got $badLines")
  }

  test("readWithCorrupt rejects a schema that already claims the corrupt column") {
    intercept[IllegalArgumentException] {
      Jsonl.readWithCorrupt(spark, "/tmp/nope.jsonl", StructType(Seq(
        StructField(Jsonl.CorruptCol, StringType))))
    }
  }

  test("single-file sink round-trips through read") {
    val path = writeFixture(good)
    val df = Jsonl.read(spark, path, schema)
    val out = Files.createTempDirectory("graft-jsonl-out").toString + "/docs.jsonl"
    Jsonl.write(df, out)
    assert(new java.io.File(out).isFile, "must be a single promoted file")
    val back = Jsonl.read(spark, out, schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      == df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet)
  }
}
