package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — north-star extension.
  *
  * Images/audio/video are opaque `binary` columns with a typed metadata
  * struct alongside. The Spark-side machinery — schema, partition-friendly
  * batch iteration, column contracts — is real and tested; the actual
  * codec calls are STUBBED behind [[StubCodec]] (deterministic fakes —
  * the image/audio libraries are not in this container). Swapping in a
  * real decoder means replacing StubCodec only: the operator shapes,
  * `mapPartitions` batching, and schemas stay as-is.
  *
  * Scale notes: decode/feature-extract run per-partition with an
  * iterator-to-iterator transform (the JVM analog of `mapInPandas` —
  * constant memory, no per-row UDF overhead); binary payloads never
  * shuffle (all derived columns are computed before any wide operator).
  */
object Multimodal {

  /** media metadata contract */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  val FeatureDim = 16

  /** Deterministic fake codec: "decodes" metadata and features from the
    * bytes alone. Replace with a real codec (JPEG/PNG/audio) off-container. */
  object StubCodec extends Serializable {
    def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      val fmt = Seq("jpeg", "png", "webp")(math.floorMod(h, 3))
      val w = 64 + math.floorMod(h >> 3, 1024)
      val ht = 64 + math.floorMod(h >> 13, 1024)
      (fmt, w, ht, 3)
    }
    /** Fake feature extraction: FeatureDim moments over byte windows. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      if (bytes.isEmpty) return out
      var i = 0
      while (i < bytes.length) {
        out(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, bytes.length / FeatureDim)
      out.map(_ / n)
    }
    /** Fake resize: metadata-only transform (a real impl re-encodes bytes). */
    def resize(w: Int, h: Int, targetW: Int, targetH: Int): (Int, Int) =
      (targetW, math.max(1, math.round(h.toFloat * targetW / math.max(1, w))))
  }

  /** Attach a metadata struct decoded from the binary column. */
  def withDecodedMeta(df: DataFrame, binCol: String, outCol: String = "media_meta"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(outCol, MetaSchema)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binCol)
        val (fmt, w, h, c) = StubCodec.decodeMeta(bytes)
        Row.fromSeq(row.toSeq :+ Row(fmt, w, h, c, bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Attach a feature vector extracted per partition (batched iterator —
    * the decode path a real codec would also use). */
  def withFeatures(df: DataFrame, binCol: String, outCol: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binCol)
        Row.fromSeq(row.toSeq :+ StubCodec.features(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Metadata-level resize (stub: real impl maps the bytes too). */
  def resized(df: DataFrame, metaCol: String, targetW: Int, targetH: Int,
      outCol: String = "resized_meta"): DataFrame =
    df.withColumn(outCol, struct(
      col(s"$metaCol.format").as("format"),
      lit(targetW).as("width"),
      greatest(lit(1), round(col(s"$metaCol.height") * targetW / greatest(col(s"$metaCol.width"), lit(1)))
        .cast("integer")).as("height"),
      col(s"$metaCol.channels").as("channels"),
      col(s"$metaCol.n_bytes").as("n_bytes")))

  /** Frame sampling for a (fake) video track: every nth frame index up to
    * `maxFrames` — demonstrates the explode-to-frames shape. */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int, every: Int): DataFrame =
    df.select(col(idCol),
      explode(sequence(lit(0), lit((nFrames - 1) * every), lit(every))).as("frame_idx"))
}
