package graft

import graft.sources.TokenizedExport
import org.apache.spark.sql.functions._

/** Binary token export: vocabulary determinism, id encoding, the
  * write→read round-trip (both dtypes), the shard deal's agreement with
  * ShardedExport, empty-shard backfill, and the fail-loud contracts. */
class TokenizedExportSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(dir: String) =
    Tables.documents(spark, dir).where(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.normalizeText(col("text"))).as("toks"))

  test("vocabulary: ids are 0..V-1 in lexicographic token order") {
    val d = toksOf("/root/testdata/sf0.001")
    val v = TokenizedExport.vocabulary(d, "toks")
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(v.map(_._2).toSeq == v.indices.toSeq)
    assert(v.map(_._1).toSeq == v.map(_._1).toSeq.sorted)
    val distinct = d.select(explode(col("toks"))).distinct().count()
    assert(v.length.toLong == distinct)
  }

  test("encodeIds inverts through the vocabulary; unknown tokens fail loud") {
    val d = toksOf("/root/testdata/sf0.001")
    val vocab = TokenizedExport.vocabulary(d, "toks")
    val idToTok = vocab.collect().map(r => r.getInt(1) -> r.getString(0)).toMap
    val enc = TokenizedExport.encodeIds(d, "toks", vocab)
      .select("doc_id", "toks", "token_ids").collect()
    enc.foreach { r =>
      val toks = r.getAs[scala.collection.Seq[String]]("toks")
      val ids = r.getAs[scala.collection.Seq[Int]]("token_ids")
      assert(ids.map(idToTok) == toks, s"doc ${r.getLong(0)}")
    }
    val bad = Seq((1L, Seq("aardvark"))).toDF("doc_id", "toks")
    val ex = intercept[org.apache.spark.SparkException] {
      TokenizedExport.encodeIds(bad, "toks", vocab).collect()
    }
    assert(ex.getMessage.contains("not in vocabulary")
      || Option(ex.getCause).exists(_.getMessage.contains("not in vocabulary")))
  }

  test("write -> read round-trips ids, training order, and the ShardedExport deal") {
    val d = toksOf("/root/testdata/sf0.001")
    val vocab = TokenizedExport.vocabulary(d, "toks")
    val vsize = vocab.count().toInt
    assert(vsize <= 65536, "fixture should exercise the u16 path")
    val enc = TokenizedExport.encodeIds(d, "toks", vocab)
    val dir = java.nio.file.Files.createTempDirectory("tokbin").toString
    TokenizedExport.write(enc, "doc_id", "token_ids", dir, nShards = 4,
      vocabSize = vsize)
    val back = TokenizedExport.read(spark, dir)
    // ids round-trip exactly, doc for doc
    val want = enc.select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    val got = back.select("doc_id", "token_ids").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getAs[scala.collection.Seq[Int]]("token_ids").toSeq).toMap
    assert(got == want)
    // shard + within-shard order == ShardedExport's rank-order deal
    val deal = graft.sources.ShardedExport.withShard(enc, "doc_id", 4)
      .select("doc_id", "shard", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantOrd = deal.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(_._3).zipWithIndex.map { case ((id, sh, _), i) => (id, sh, i) }
    }.toSet
    val gotOrd = back.select("doc_id", "shard", "ordinal").collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("shard")),
        r.getInt(r.fieldIndex("ordinal")))).toSet
    assert(gotOrd == wantOrd)
    // the manifest returned by write matches a recount of the read-back
    val m = TokenizedExport.manifest(enc, "doc_id", "token_ids", 4)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val re = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum(size(col("token_ids")).cast("long")).as("t"))
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n"), r.getAs[Long]("t"))).toMap
    assert(re == m)
  }

  test("u32 dtype: ids beyond 65535 round-trip when vocabSize > 65536") {
    val df = Seq((1L, Seq(0, 65535, 65536, 1000000)), (2L, Seq(70000)))
      .toDF("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("tokbin32").toString
    TokenizedExport.write(df, "doc_id", "token_ids", dir, nShards = 2,
      vocabSize = 1000001)
    val got = TokenizedExport.read(spark, dir)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    assert(got == Map(1L -> Seq(0, 65535, 65536, 1000000), 2L -> Seq(70000)))
  }

  test("every shard file exists even when empty (nShards > nDocs)") {
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("tokbin8").toString
    TokenizedExport.write(df, "doc_id", "token_ids", dir, nShards = 8,
      vocabSize = 16)
    (0 until 8).foreach { k =>
      assert(new java.io.File(dir, s"shard-$k.idx").exists(), s"idx $k")
      assert(new java.io.File(dir, s"shard-$k.bin").exists(), s"bin $k")
    }
    val back = TokenizedExport.read(spark, dir)
    assert(back.count() == 2)
    assert(back.select("shard").distinct().count() == 2)
  }

  test("fail loud: id outside [0, vocabSize) and null id arrays") {
    val over = Seq((1L, Seq(5))).toDF("doc_id", "token_ids")
    val d1 = java.nio.file.Files.createTempDirectory("tokbinE1").toString
    val e1 = intercept[org.apache.spark.SparkException] {
      TokenizedExport.write(over, "doc_id", "token_ids", d1, 1, vocabSize = 5)
    }
    assert(e1.getMessage.contains("outside")
      || Option(e1.getCause).exists(_.getMessage.contains("outside")))
    val nul = Seq((1L, Seq(1)), (2L, null)).toDF("doc_id", "token_ids")
    val d2 = java.nio.file.Files.createTempDirectory("tokbinE2").toString
    val e2 = intercept[org.apache.spark.SparkException] {
      TokenizedExport.write(nul, "doc_id", "token_ids", d2, 1, vocabSize = 5)
    }
    assert(e2.getMessage.contains("null token-id")
      || Option(e2.getCause).exists(_.getMessage.contains("null token-id")))
  }

  test("empty token arrays are preserved (zero-length doc, not a drop)") {
    val df = Seq((1L, Seq(7, 8)), (2L, Seq.empty[Int])).toDF("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("tokbinZ").toString
    TokenizedExport.write(df, "doc_id", "token_ids", dir, nShards = 1,
      vocabSize = 16)
    val got = TokenizedExport.read(spark, dir)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    assert(got == Map(1L -> Seq(7, 8), 2L -> Seq.empty[Int]))
  }

  test("append: new shards after the existing max, bytes of A untouched, union reads back exactly once") {
    val a = Seq((1L, Seq(1, 2)), (2L, Seq(3)), (3L, Seq(4, 5, 6))).toDF("doc_id", "token_ids")
    val b = Seq((10L, Seq(7)), (11L, Seq(8, 9))).toDF("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("tokapp").toString
    TokenizedExport.write(a, "doc_id", "token_ids", dir, nShards = 2, vocabSize = 16)
    val beforeBytes = (0 until 2).map { k =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, s"shard-$k.bin")).toSeq
    }
    val incManifest = TokenizedExport.append(b, "doc_id", "token_ids", dir,
      nShards = 2, vocabSize = 16)
    // increment manifest reports the RENUMBERED shards
    assert(incManifest.select("shard").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // existing bytes immutable
    (0 until 2).foreach { k =>
      val now = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, s"shard-$k.bin")).toSeq
      assert(now == beforeBytes(k), s"shard $k bytes changed under append")
    }
    // the union reads back exactly once, doc for doc
    val got = TokenizedExport.read(spark, dir)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    assert(got == Map(1L -> Seq(1, 2), 2L -> Seq(3), 3L -> Seq(4, 5, 6),
      10L -> Seq(7), 11L -> Seq(8, 9)))
    // append == write(B) renumbered: the increment's shard files carry
    // the same deal write(B) alone would produce
    val solo = java.nio.file.Files.createTempDirectory("tokappS").toString
    TokenizedExport.write(b, "doc_id", "token_ids", solo, nShards = 2, vocabSize = 16)
    (0 until 2).foreach { k =>
      val ap = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, s"shard-${k + 2}.bin")).toSeq
      val wr = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(solo, s"shard-$k.bin")).toSeq
      assert(ap == wr, s"increment shard $k bytes differ from a solo write")
    }
  }

  test("append: dtype mismatch and missing export fail loud") {
    val a = Seq((1L, Seq(1))).toDF("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("tokappE").toString
    TokenizedExport.write(a, "doc_id", "token_ids", dir, nShards = 1, vocabSize = 16)
    val e1 = intercept[IllegalArgumentException] {
      TokenizedExport.append(a, "doc_id", "token_ids", dir, 1, vocabSize = 70000)
    }
    assert(e1.getMessage.contains("dtype mismatch"))
    val empty = java.nio.file.Files.createTempDirectory("tokappE2").toString
    val e2 = intercept[IllegalArgumentException] {
      TokenizedExport.append(a, "doc_id", "token_ids", empty, 1, vocabSize = 16)
    }
    assert(e2.getMessage.contains("no existing export"))
  }

  test("null doc ids fail loud at write (getLong would silently write 0)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("token_ids", ArrayType(IntegerType))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(java.lang.Long.valueOf(1L), Seq(1)),
      org.apache.spark.sql.Row(null, Seq(2)))
    val df = spark.createDataFrame(rows, schema)
    val dir = java.nio.file.Files.createTempDirectory("tokbinN").toString
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.TokenizedExport.write(df, "doc_id", "token_ids", dir, 1, vocabSize = 5)
    }
    assert(e.getMessage.contains("null doc id")
      || Option(e.getCause).exists(_.getMessage.contains("null doc id")))
  }

  test("verify: clean bill on an intact export; corrupted and missing shards are flagged") {
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3)), (3L, Seq(4, 5)), (4L, Seq(6)))
      .toDF("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("tokver").toString
    val manifest = TokenizedExport.write(df, "doc_id", "token_ids", dir,
      nShards = 2, vocabSize = 16)
    assert(TokenizedExport.verify(spark, dir, manifest).count() == 0)
    // flip one token byte in shard 0 -> content hash mismatch on shard 0
    // only (the Hadoop local-FS .crc sidecar would catch an out-of-band
    // edit first — drop it so the MANIFEST is the detection layer under
    // test, as on filesystems without sidecar checksums)
    val bin = java.nio.file.Paths.get(dir, "shard-0.bin")
    val crc = java.nio.file.Paths.get(dir, ".shard-0.bin.crc")
    java.nio.file.Files.deleteIfExists(crc)
    val bytes = java.nio.file.Files.readAllBytes(bin)
    bytes(0) = (bytes(0) ^ 0x01).toByte
    java.nio.file.Files.write(bin, bytes)
    val bad = TokenizedExport.verify(spark, dir, manifest).collect()
    assert(bad.map(_.getAs[Long]("shard")).toSeq == Seq(0L), bad.mkString(";"))
    // restore, then drop a shard pair entirely -> found side null
    bytes(0) = (bytes(0) ^ 0x01).toByte
    java.nio.file.Files.write(bin, bytes)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, ".shard-1.bin.crc"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, ".shard-1.idx.crc"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "shard-1.bin"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "shard-1.idx"))
    val missing = TokenizedExport.verify(spark, dir, manifest).collect()
    assert(missing.map(_.getAs[Long]("shard")).toSeq == Seq(1L))
    assert(missing.head.isNullAt(missing.head.fieldIndex("n_docs_found")))
  }
}
