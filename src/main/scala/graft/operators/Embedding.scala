package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The REAL-ENCODER SEAM: every embedding column this library consumes
  * (chunk→pool document vectors, the similarity/dedup/decontamination
  * family, the streaming screens) is produced behind this one interface,
  * so a production deployment swaps the sandbox's hashing-TF stub for a
  * neural encoder without touching any downstream operator.
  *
  * CONTRACT (what every implementation must satisfy — the spec drives a
  * mock encoder through the full chunk→pool composition to pin the
  * plumbing against exactly these laws):
  *
  *  - **Schema**: `encode(df, textCol, outCol)` returns `df` with ONE
  *    added column `outCol: array<float>` of length exactly [[TextEncoder.dim]];
  *    a null text encodes to a null array (never a zero vector — the
  *    pooling layer drops nulls explicitly, and a zero vector would
  *    silently shift pooled means).
  *  - **Row discipline**: no row may be dropped, duplicated or
  *    reordered relative to engine semantics — the result must be the
  *    same frame plus a column (implementations should be one
  *    map-side projection: a Catalyst expression chain, a batched UDF,
  *    or `mapInPandas` feeding a GPU model server in batches; never an
  *    aggregation or join).
  *  - **Determinism**: equal text MUST yield a bit-equal vector within
  *    one corpus version (cache or fix model weights + fp mode). The
  *    dedup/decontamination thresholds and every hash-compared gate
  *    rely on run-to-run stability. A nondeterministic encoder (dropout
  *    at inference, nondeterministic GPU reductions) breaks
  *    [[Similarity.semanticDecontaminate]]'s tau reproducibility and
  *    any persisted [[Similarity.IvfIndex]] built from its output.
  *  - **What breaks the oracles**: the driver gates (q_chunk_pool,
  *    q_text_knn, …) replay the hashing-TF arithmetic in SQL, so they
  *    gate THE PLUMBING with the stub encoder — swapping in a real
  *    model invalidates the embedded-constant oracles (IVF/PQ
  *    centroids, tau/margin literals) exactly like a testdata
  *    regeneration: re-run the fit probes (OracleFitProbe etc.) and
  *    re-measure the threshold gaps before trusting a hash gate.
  *
  * Scale shape: encode is embarrassingly parallel; the expensive real
  * encoder amortizes through `mapInPandas`-style batching (the
  * [[Multimodal]] decode seam pattern) and the composition keeps text
  * on its input partitions until the pooling shuffle of (group, pos,
  * value) triples — vectors, never text, cross the wire.
  */
object Embedding {

  /** The pluggable text-embedding model. See [[Embedding]] for the
    * contract every implementation owes the downstream operators. */
  trait TextEncoder extends Serializable {
    /** Fixed output dimensionality; every non-null vector has exactly
      * this length. */
    def dim: Int
    /** Append `outCol: array<float>` to `df` — one map-side projection,
      * no row surgery. */
    def encode(df: DataFrame, textCol: String, outCol: String): DataFrame
  }

  /** The sandbox default: hashing-trick term-frequency vectors
    * ([[graft.functions.TextFunctions.hashingTfVector]] — portable md5
    * feature hashing, integer counts). No model runtime, fully
    * deterministic, and the form every embedding-consuming oracle gate
    * replays in SQL. */
  final case class HashingTfEncoder(dim: Int) extends TextEncoder {
    def encode(df: DataFrame, textCol: String, outCol: String): DataFrame =
      df.withColumn(outCol,
        graft.functions.TextFunctions.hashingTfVector(col(textCol), dim)
          .cast("array<float>"))
  }

  /** Document embeddings through the pluggable encoder: overlapping
    * token windows → per-chunk vectors → per-document exact-decimal
    * mean pooling. The composition q_chunk_pool gates with the stub
    * encoder, exposed as an operator with the encoder as a parameter.
    *
    * Output: (idCol, embedding array<double> in position order) — one
    * row per input document that has at least one token; null-text and
    * token-free documents produce no row (they have nothing to encode).
    */
  def documentEmbeddings(docs: DataFrame, textCol: String, idCol: String,
      encoder: TextEncoder, maxTokens: Int = 32, overlap: Int = 8): DataFrame = {
    val chunks = Packing.chunkWindows(
      docs.where(col(textCol).isNotNull), textCol, idCol, maxTokens, overlap)
    val vecs = encoder.encode(chunks, "chunk_text", "__v")
    Similarity.meanPoolBy(vecs, "__v", idCol)
  }
}
