package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Embedding, Packing, Similarity}

/** The real-encoder seam (Embedding.TextEncoder): a mock "model"
  * encoder — deterministic, but numerically nothing like hashing-TF —
  * driven through the full chunk→encode→pool composition, pinning the
  * plumbing laws the contract promises a production encoder:
  * row discipline, fixed dim, null policy, determinism, and pooling
  * correctness independent of WHAT the vectors are. */
class EmbeddingSeamSpec extends SparkSpec {
  import spark.implicits._

  /** Stand-in for a neural encoder: vector components are a pure
    * function of (text hash, position) — nothing the hashing-TF stub
    * could produce, so parity bugs cannot hide behind shared
    * arithmetic. Implemented exactly as the contract prescribes: one
    * map-side projection, null text → null array. */
  case class MockModelEncoder(dim: Int) extends Embedding.TextEncoder {
    def encode(df: DataFrame, textCol: String, outCol: String): DataFrame =
      df.withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("array<float>"))
          .otherwise(transform(sequence(lit(0), lit(dim - 1)),
            i => sin(xxhash64(col(textCol)).cast("double") / 1e9 +
              i.cast("double")).cast("float"))))
  }

  lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("contract: one added array<float> column, fixed dim, null text -> null") {
    val enc = MockModelEncoder(8)
    val in = docs.select("doc_id", "text")
    val out = enc.encode(in, "text", "v")
    assert(out.columns.toSeq == Seq("doc_id", "text", "v"), "one added column")
    assert(out.schema("v").dataType.simpleString == "array<float>")
    assert(out.count() == in.count(), "no row surgery")
    val sizes = out.where(col("text").isNotNull)
      .select(size(col("v"))).distinct().collect().map(_.getInt(0))
    assert(sizes.sameElements(Array(8)), s"fixed dim: ${sizes.toSeq}")
    assert(out.where(col("text").isNull && col("v").isNotNull).count() == 0,
      "null text must encode to null, not a zero vector")
  }

  test("chunk->encode->pool with the mock model: per-doc pooling laws hold") {
    val enc = MockModelEncoder(8)
    val pooled = Embedding.documentEmbeddings(docs, "text", "doc_id", enc,
      maxTokens = 32, overlap = 8)
    assert(pooled.columns.toSeq == Seq("doc_id", "embedding"))
    // one row per doc that produced chunks; every embedding full-dim
    val nDocs = Packing.chunkWindows(docs.where(col("text").isNotNull),
      "text", "doc_id", 32, 8).select("doc_id").distinct().count()
    assert(pooled.count() == nDocs)
    assert(pooled.where(size(col("embedding")) =!= 8).count() == 0)
    // pooling is the exact mean of the doc's chunk vectors: re-derive
    // driver-side for a sample of documents
    val chunks = enc.encode(Packing.chunkWindows(
      docs.where(col("text").isNotNull), "text", "doc_id", 32, 8),
      "chunk_text", "v")
      .select(col("doc_id"), col("v"))
      .where(col("doc_id") < 20)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .groupBy(_._1)
    val got = pooled.where(col("doc_id") < 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    chunks.foreach { case (id, vs) =>
      val exp = (0 until 8).map { j =>
        vs.map(_._2(j).toDouble).sum / vs.length
      }
      val g = got(id)
      (0 until 8).foreach(j => assert(math.abs(g(j) - exp(j)) < 1e-9,
        s"doc $id dim $j: ${g(j)} vs ${exp(j)}"))
    }
  }

  test("determinism and partitioning invariance through the seam") {
    val enc = MockModelEncoder(8)
    val a = Embedding.documentEmbeddings(docs, "text", "doc_id", enc)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = Embedding.documentEmbeddings(docs.repartition(13), "text",
      "doc_id", enc)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b), "seam output must be bit-deterministic")
  }

  test("seam form with the stub encoder equals the inline q_chunk_pool form") {
    val viaSeam = Embedding.documentEmbeddings(docs, "text", "doc_id",
      Embedding.HashingTfEncoder(32), maxTokens = 32, overlap = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val inline = Similarity.meanPoolBy(
      Packing.chunkWindows(docs.where(col("text").isNotNull), "text",
        "doc_id", 32, 8)
        .select(col("doc_id"),
          graft.functions.TextFunctions.hashingTfVector(col("chunk_text"), 32)
            .as("v")),
      "v", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(viaSeam.sameElements(inline),
      "HashingTfEncoder through the seam must be bit-identical to the inline composition")
  }

  test("downstream operators are encoder-agnostic: decontamination runs on mock vectors") {
    val enc = MockModelEncoder(8)
    val pooled = Embedding.documentEmbeddings(docs, "text", "doc_id", enc)
    val eval = pooled.where(pmod(col("doc_id"), lit(31)) === 0)
    val corpus = pooled.where(pmod(col("doc_id"), lit(31)) =!= 0)
    val out = Similarity.semanticDecontaminate(corpus, eval,
      "embedding", "doc_id", tau = 0.999)
    // survivors are a subset; the operator never cares where the
    // vectors came from
    assert(out.count() <= corpus.count())
    assert(out.columns.sameElements(corpus.columns))
  }
}
