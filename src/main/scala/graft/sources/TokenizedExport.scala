package graft.sources

import graft.functions.TextFunctions.portableHash
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pre-tokenized binary corpus export — the Megatron-LM-style "last
  * inch" after [[ShardedExport]]'s JSONL last mile: training loaders
  * don't re-tokenize text per epoch, they mmap fixed-width token-id
  * shards (Shoeybi et al. 2019's indexed dataset; every major trainer
  * has an equivalent). One `.bin` + `.idx` pair per shard:
  *
  *  - `shard-<k>.bin`: the shard's token ids concatenated in training
  *    order, little-endian, 2 bytes/id when `vocabSize ≤ 65536` else 4
  *    (the u16/u32 split is the real storage lever — a 50k-vocab corpus
  *    halves its footprint);
  *  - `shard-<k>.idx`: magic `GRFTIDX1`, dtype code, doc count, then
  *    per doc `(doc_id: i64, token_offset: i64, n_tokens: i32)` — the
  *    random-access table a data-parallel reader seeks by.
  *
  * Training order and shard deal are EXACTLY [[ShardedExport]]'s:
  * global rank from [[graft.operators.Sampling.deterministicShuffle]],
  * shard = (rank−1) mod n, docs laid out in rank order within each
  * shard — so rank-ordered shard walks interleave back into the global
  * order, and the JSONL and binary exports of the same mix agree
  * doc-for-doc. All-integer layout: no floats anywhere, so the bytes
  * are bit-reproducible across runs and engines.
  *
  * The writer is ids-in, bytes-out: pair it with any tokenizer
  * ([[vocabulary]]/[[encodeIds]] for a corpus-derived id space,
  * [[graft.functions.Bpe.tokenize]] upstream for real subwords). Null
  * id arrays and ids outside the dtype range FAIL LOUD at write time —
  * a binary sink that silently dropped or truncated rows would poison
  * every downstream epoch.
  *
  * Scale shape: one shard shuffle (the payload crosses the wire once),
  * per-shard files written by the tasks that own the rows via the
  * Hadoop FileSystem API (any storage scheme), manifest a partial
  * aggregate over `nShards` keys. The reader is one task per shard.
  */
object TokenizedExport {

  private val Magic = "GRFTIDX1".getBytes("US-ASCII")

  /** Sorted-distinct token vocabulary of an `array<string>` column:
    * `(token, id)` with ids 0..V−1 in lexicographic token order —
    * deterministic, engine-replayable (`row_number() − 1` over the
    * sorted distinct tokens in SQL). Ids come from a range-partitioned
    * sort + zipWithIndex, NOT a single-partition window — tokens are
    * distinct, so the index is the rank with no tie ambiguity, and no
    * task ever holds the whole vocabulary. */
  def vocabulary(df: DataFrame, tokensCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(explode(col(tokensCol)).as("token")).distinct()
      .orderBy("token").rdd
      .zipWithIndex.map { case (r, i) => Row(r.getString(0), i.toInt) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false))))
  }

  /** Map an `array<string>` token column to `array<int>` ids against a
    * [[vocabulary]] frame. The vocab collects once and broadcasts into
    * a map-side lookup (no explode/re-group shuffle of the corpus);
    * unknown tokens fail loud — an id space that silently skips tokens
    * shifts every downstream offset. */
  def encodeIds(df: DataFrame, tokensCol: String, vocab: DataFrame,
      outCol: String = "token_ids"): DataFrame = {
    val m = vocab.select("token", "id").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val bc = df.sparkSession.sparkContext.broadcast(m)
    val enc = udf { (toks: Seq[String]) =>
      if (toks == null) null
      else toks.map(t => bc.value.getOrElse(t,
        throw new IllegalArgumentException(
          s"encodeIds: token '$t' not in vocabulary"))).toArray
    }
    df.withColumn(outCol, enc(col(tokensCol)))
  }

  /** Input columns + (shuffle_rank, shard) — [[ShardedExport.withShard]]
    * verbatim, re-exposed so binary and JSONL exports of one mix share
    * the deal by construction. */
  def withShard(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame =
    ShardedExport.withShard(df, idCol, nShards, seed)

  /** Per-shard manifest without touching a filesystem:
    * `shard, n_docs, n_tokens, content_hash` — the hash the
    * [[ShardedExport]] XOR discipline applied to the id sequence
    * (`len(id):id:ids-joined-by-' '`), order-free and engine-portable
    * (DuckDB: `bit_xor` over the same md5-derived hashes with
    * `array_to_string`). */
  def manifest(df: DataFrame, idCol: String, idsCol: String, nShards: Int,
      seed: Long = 42L): DataFrame =
    withShard(df, idCol, nShards, seed)
      .withColumn("__ph", portableHash(concat(
        length(col(idCol).cast("string")).cast("string"), lit(":"),
        col(idCol).cast("string"), lit(":"),
        array_join(col(idsCol), " "))))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col(idsCol)).cast("long")).as("n_tokens"),
        expr("bit_xor(__ph)").as("content_hash"))

  /** Write `shard-<k>.bin`/`.idx` pairs under `dir` and return the
    * [[manifest]]. `vocabSize` fixes the dtype (u16 iff ≤ 65536) so the
    * byte layout is a pure function of the input — no data-dependent
    * probe pass. Every shard file exists even when empty (data-parallel
    * readers open all n). */
  def write(df: DataFrame, idCol: String, idsCol: String, dir: String,
      nShards: Int, vocabSize: Int, seed: Long = 42L,
      shardOffset: Long = 0L): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(shardOffset >= 0, s"shardOffset must be >= 0, got $shardOffset")
    val wide = vocabSize > 65536
    val sharded = graft.core.CacheScope.retain(
      withShard(df, idCol, nShards, seed)
        .select(col(idCol).cast("long").as("__id"),
          (col("shard") + lit(shardOffset)).as("shard"),
          col("shuffle_rank"), col(idsCol).as("__ids")))
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_rank"))
      .foreachPartition { rows: Iterator[Row] =>
        writePartition(rows, dir, wide, vocabSize, confSer.value)
      }
    // hash partitioning may leave some shard values fileless (collisions
    // route two shards to one task, none to another) — materialize the
    // written set and backfill header-only pairs for the missing shards
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), confSer.value)
    val base = new org.apache.hadoop.fs.Path(dir)
    (shardOffset until shardOffset + nShards).foreach { k =>
      val idx = new org.apache.hadoop.fs.Path(base, s"shard-$k.idx")
      if (!fs.exists(idx)) {
        val out = fs.create(idx, true)
        out.write(idxHeader(wide, 0))
        out.close()
        fs.create(new org.apache.hadoop.fs.Path(base, s"shard-$k.bin"), true)
          .close()
      }
    }
    sharded
      .withColumn("__ph", portableHash(concat(
        length(col("__id").cast("string")).cast("string"), lit(":"),
        col("__id").cast("string"), lit(":"),
        array_join(col("__ids"), " "))))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__ids")).cast("long")).as("n_tokens"),
        expr("bit_xor(__ph)").as("content_hash"))
  }

  /** Append an increment to an existing export: the new docs are dealt
    * by the SAME deterministic shuffle over their own ids into
    * `nShards` NEW shard files numbered after the existing maximum —
    * existing bytes are immutable (trainers mmap them; rewriting a
    * live shard under a reader is the one unforgivable sink bug), so
    * growth is append-only at the file level, the
    * [[graft.operators.LshIndex]]/[[graft.operators.Bm25.Bm25Index]]
    * append discipline adapted to a sink: append(A,B) yields the same
    * BYTES as write(A) plus write(B) renumbered (it IS write at
    * `shardOffset` = existing max + 1), and a reader of the union sees
    * every doc exactly once. The dtype must match the existing export
    * (meta is the `.idx` header's dtype byte — read from the lowest
    * existing shard, validated loud): a u16 corpus cannot silently
    * receive u32 ids. Returns the increment's manifest. */
  def append(df: DataFrame, idCol: String, idsCol: String, dir: String,
      nShards: Int, vocabSize: Int, seed: Long = 42L): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir), conf)
    val base = new org.apache.hadoop.fs.Path(dir)
    val existing = fs.listStatus(base).map(_.getPath.getName)
      .collect { case n if n.startsWith("shard-") && n.endsWith(".idx") =>
        n.stripPrefix("shard-").stripSuffix(".idx").toLong }
    require(existing.nonEmpty,
      s"TokenizedExport.append: no existing export under $dir — use write")
    val in = fs.open(
      new org.apache.hadoop.fs.Path(base, s"shard-${existing.min}.idx"))
    val head = new Array[Byte](Magic.length + 1)
    try in.readFully(0, head) finally in.close()
    require(java.util.Arrays.equals(head.take(Magic.length), Magic),
      s"TokenizedExport.append: $dir/shard-${existing.min}.idx has no GRFTIDX1 magic")
    val existingWide = head(Magic.length) == 4.toByte
    val wide = vocabSize > 65536
    require(existingWide == wide,
      s"TokenizedExport.append: dtype mismatch — existing export is " +
        s"${if (existingWide) "u32" else "u16"} but vocabSize $vocabSize " +
        s"implies ${if (wide) "u32" else "u16"}; rebuild instead")
    write(df, idCol, idsCol, dir, nShards, vocabSize, seed,
      shardOffset = existing.max + 1)
  }

  /** Integrity check of an export directory against an expected
    * [[manifest]] (the training side's pre-flight): re-reads every
    * shard, recounts docs/tokens, re-derives the order-free content
    * hash from the decoded bytes, and returns ONE ROW PER MISMATCHED
    * SHARD with both sides' numbers (`*_expected` vs `*_found`) —
    * empty result = clean bill. Shards present on disk but absent from
    * the manifest (or vice versa) mismatch on null counts rather than
    * silently passing. Cost: the distributed [[read]] plus a
    * shards-sized join. */
  def verify(spark: SparkSession, dir: String,
      expected: DataFrame): DataFrame = {
    val found = read(spark, dir)
      .withColumn("__ph", portableHash(concat(
        length(col("doc_id").cast("string")).cast("string"), lit(":"),
        col("doc_id").cast("string"), lit(":"),
        array_join(col("token_ids"), " "))))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs_found"),
        sum(size(col("token_ids")).cast("long")).as("n_tokens_found"),
        expr("bit_xor(__ph)").as("content_hash_found"))
    expected.select(col("shard"),
        col("n_docs").as("n_docs_expected"),
        col("n_tokens").as("n_tokens_expected"),
        col("content_hash").as("content_hash_expected"))
      .join(found, Seq("shard"), "full_outer")
      .where(
        !(col("n_docs_expected") <=> col("n_docs_found")) ||
        !(col("n_tokens_expected") <=> col("n_tokens_found")) ||
        !(col("content_hash_expected") <=> col("content_hash_found")))
  }

  private def idxHeader(wide: Boolean, nDocs: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(Magic.length + 1 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Magic).put(if (wide) 4.toByte else 2.toByte).putInt(nDocs)
    b.array()
  }

  private def writePartition(rows: Iterator[Row], dir: String,
      wide: Boolean, vocabSize: Int,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir), conf)
    val base = new org.apache.hadoop.fs.Path(dir)
    var shard = -1L
    var bin: java.io.DataOutputStream = null
    var idxDocs = List.empty[(Long, Long, Int)] // reversed (id, off, len)
    var off = 0L
    def flush(): Unit = if (shard >= 0) {
      bin.close()
      val out = fs.create(new org.apache.hadoop.fs.Path(base, s"shard-$shard.idx"), true)
      val docs = idxDocs.reverse
      val b = java.nio.ByteBuffer.allocate(20 * docs.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      docs.foreach { case (id, o, n) => b.putLong(id).putLong(o).putInt(n) }
      out.write(idxHeader(wide, docs.length))
      out.write(b.array())
      out.close()
    }
    rows.foreach { r =>
      val s = r.getAs[Long]("shard")
      if (s != shard) {
        flush()
        shard = s
        off = 0L
        idxDocs = Nil
        bin = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          fs.create(new org.apache.hadoop.fs.Path(base, s"shard-$s.bin"), true),
          1 << 16))
      }
      require(!r.isNullAt(r.fieldIndex("__id")),
        "TokenizedExport: null doc id — getLong would silently write id 0")
      val id = r.getLong(r.fieldIndex("__id"))
      val ids = r.getAs[scala.collection.Seq[Int]]("__ids")
      require(ids != null,
        s"TokenizedExport: null token-id array for doc $id — " +
          "a binary sink cannot silently drop rows")
      ids.foreach { t =>
        require(t >= 0 && t < vocabSize,
          s"TokenizedExport: id $t outside [0, $vocabSize) for doc $id")
        if (wide) {
          bin.write(t & 0xFF); bin.write((t >> 8) & 0xFF)
          bin.write((t >> 16) & 0xFF); bin.write((t >> 24) & 0xFF)
        } else {
          bin.write(t & 0xFF); bin.write((t >> 8) & 0xFF)
        }
      }
      idxDocs = (id, off, ids.length) :: idxDocs
      off += ids.length
    }
    flush()
  }

  /** Distributed read-back: one task per shard decodes its `.idx` and
    * seeks the paired `.bin` — `(shard, ordinal, doc_id, token_ids)`
    * with `ordinal` the doc's rank-order position within the shard.
    * The verification half of the write→verify contract (and a usable
    * consumer for shard-parallel jobs). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("shard-") && n.endsWith(".idx") =>
        n.stripPrefix("shard-").stripSuffix(".idx").toLong }
      .sorted
    val schema = StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("ordinal", IntegerType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("token_ids", ArrayType(IntegerType, containsNull = false))))
    val rdd = spark.sparkContext
      .parallelize(shards.toIndexedSeq, math.max(shards.length, 1))
      .flatMap { k =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(dir), confSer.value)
        val base = new org.apache.hadoop.fs.Path(dir)
        val idxBytes = readAll(fs, new org.apache.hadoop.fs.Path(base, s"shard-$k.idx"))
        val b = java.nio.ByteBuffer.wrap(idxBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val magic = new Array[Byte](Magic.length)
        b.get(magic)
        require(java.util.Arrays.equals(magic, Magic),
          s"shard-$k.idx: bad magic")
        val width = b.get().toInt
        val n = b.getInt()
        val docs = (0 until n).map(_ => (b.getLong(), b.getLong(), b.getInt()))
        val binBytes = readAll(fs, new org.apache.hadoop.fs.Path(base, s"shard-$k.bin"))
        val bb = java.nio.ByteBuffer.wrap(binBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        docs.zipWithIndex.map { case ((id, o, len), i) =>
          val ids = new Array[Int](len)
          var j = 0
          while (j < len) {
            // multiply in LONG first: (o+j).toInt*width overflows for
            // shards past 2^31/width tokens and reads silent garbage
            ids(j) =
              if (width == 4) bb.getInt(((o + j) * 4L).toInt)
              else bb.getShort(((o + j) * 2L).toInt) & 0xFFFF
            j += 1
          }
          Row(k, i, id, ids.toSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    // the one-task-per-shard reader buffers a whole shard: writers at
    // scale must size nShards so shards stay under 2 GB (see PERF.md's
    // ShardedExport knob: 0.5-4 GB shards — here the byte form caps at
    // the JVM array bound, loud rather than truncated)
    require(len <= Int.MaxValue,
      s"TokenizedExport: $p is $len bytes — exceeds the 2 GB per-shard " +
        "read buffer; rebuild with more shards")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}
