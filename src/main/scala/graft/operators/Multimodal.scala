package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — north-star extension.
  *
  * Images/audio/video are opaque `binary` columns with a typed metadata
  * struct alongside. Image decode is REAL where the JDK reaches:
  * [[ImageCodec]] reads PNG/JPEG/GIF/BMP headers and pixels through
  * `javax.imageio` (no external libraries). Payloads the JDK cannot
  * decode (webp, audio, video, arbitrary bytes) fall back to a
  * deterministic byte-level path — format "unknown", moment features over
  * raw bytes — so the operators stay total; swapping in a richer codec
  * (audio/video) still means replacing [[ImageCodec]] only.
  *
  * Scale notes: decode/feature-extract run per-partition with an
  * iterator-to-iterator transform (the JVM analog of `mapInPandas` —
  * constant memory, no per-row UDF overhead); binary payloads never
  * shuffle (all derived columns are computed before any wide operator).
  * Header-only metadata decode reads image dimensions WITHOUT decoding
  * pixels (ImageReader.getWidth/getHeight parse the header), so
  * [[withDecodedMeta]] costs O(header) per row even for large payloads.
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

  /** JDK-native image codec (javax.imageio). All methods are total:
    * undecodable bytes yield the documented fallback rather than throwing,
    * because a 100 TB corpus WILL contain corrupt payloads and a pipeline
    * that dies on row 10¹² is useless. */
  object ImageCodec extends Serializable {

    /** Header-only metadata decode: (format, width, height, channels);
      * ("unknown", -1, -1, -1) when no installed reader claims the bytes.
      * Pixels are NOT decoded — ImageReader parses dimensions from the
      * header, keeping this O(header bytes) per payload. */
    def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
      if (bytes == null || bytes.isEmpty) return ("unknown", -1, -1, -1)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) ("unknown", -1, -1, -1)
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val fmt = r.getFormatName.toLowerCase
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val types = r.getImageTypes(0)
            val channels = if (types.hasNext) types.next().getNumBands else -1
            (fmt, w, h, channels)
          } catch {
            case _: Exception => ("unknown", -1, -1, -1)
          } finally r.dispose()
        }
      } finally if (in != null) in.close()
    }

    /** Feature extraction: for decodable images, [[FeatureDim]] spatial
      * luminance means over a 4×4 grid (a real, resolution-independent
      * image descriptor); for other payloads, deterministic byte-window
      * moments (the audio/video stand-in). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val img =
        try {
          if (bytes == null || bytes.isEmpty) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        } catch { case _: Exception => null }
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        val out = new Array[Float](FeatureDim)
        val cnt = new Array[Int](FeatureDim)
        val w = img.getWidth; val h = img.getHeight
        var y = 0
        while (y < h) {
          val gy = math.min(3, y * 4 / h)
          var x = 0
          while (x < w) {
            val gx = math.min(3, x * 4 / w)
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            val cell = gy * 4 + gx
            out(cell) += lum / 255.0f
            cnt(cell) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < FeatureDim) { if (cnt(i) > 0) out(i) /= cnt(i); i += 1 }
        out
      } else byteMomentFeatures(bytes)
    }

    /** Deterministic fallback features: windowed byte moments. */
    def byteMomentFeatures(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      if (bytes == null || bytes.isEmpty) return out
      var i = 0
      while (i < bytes.length) {
        out(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, bytes.length / FeatureDim)
      out.map(_ / n)
    }

    /** Deterministic synthetic PNG: a w×h RGB image whose pixel pattern
      * is a pure function of (x, y, seed) — the harness stand-in for real
      * payloads (the container ships no image corpus), and an end-to-end
      * probe: encode → [[decodeMeta]] must round-trip the dimensions. */
    def synthPng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        math.max(1, w), math.max(1, h), java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var z = seed * 0x9E3779B97F4A7C15L + (y.toLong * img.getWidth + x) + 1L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z ^= (z >>> 31)
          img.setRGB(x, y, (z & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real pixel resize + PNG re-encode (bilinear). Fallback: null for
      * undecodable payloads (callers keep the original). */
    def resizePng(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val img =
        try {
          if (bytes == null || bytes.isEmpty) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        } catch { case _: Exception => null }
      if (img == null) null
      else {
        val out = new java.awt.image.BufferedImage(
          math.max(1, targetW), math.max(1, targetH),
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, out.getWidth, out.getHeight, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** Shared derive-one-column skeleton: iterator-to-iterator
    * `mapPartitions` (constant memory, no per-row UDF overhead) appending
    * `f(row)` under `outCol` — the one place the batching contract lives
    * for every codec operator below. */
  private def withDerived(df: DataFrame, outCol: String, outType: DataType)(
      f: Row => Any): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(outCol, outType)
    val rdd = df.rdd.mapPartitions(it => it.map(row => Row.fromSeq(row.toSeq :+ f(row))))
    spark.createDataFrame(rdd, schema)
  }

  /** Attach a metadata struct decoded from the binary column. */
  def withDecodedMeta(df: DataFrame, binCol: String, outCol: String = "media_meta"): DataFrame =
    withDerived(df, outCol, MetaSchema) { row =>
      val bytes = row.getAs[Array[Byte]](binCol)
      val (fmt, w, h, c) = ImageCodec.decodeMeta(bytes)
      Row(fmt, w, h, c, if (bytes == null) 0L else bytes.length.toLong)
    }

  /** Attach a feature vector extracted per partition (batched iterator —
    * constant-memory decode, the shape a heavier codec also uses). */
  def withFeatures(df: DataFrame, binCol: String, outCol: String = "features"): DataFrame =
    withDerived(df, outCol, ArrayType(FloatType)) { row =>
      ImageCodec.features(row.getAs[Array[Byte]](binCol)).toSeq
    }

  /** Synthesize deterministic PNG payloads from integer width/height
    * columns (id-seeded pattern). Harness/test helper: real corpora carry
    * their own bytes; queries use this to exercise the encode→decode path
    * end-to-end with oracle-computable dimensions. */
  def withSyntheticPng(df: DataFrame, wCol: String, hCol: String,
      outCol: String = "payload", seedCol: Option[String] = None): DataFrame =
    withDerived(df, outCol, BinaryType) { row =>
      val w = row.getAs[Int](wCol)
      val h = row.getAs[Int](hCol)
      val seed = seedCol.map(c => row.getAs[Long](c)).getOrElse(w.toLong * 31 + h)
      ImageCodec.synthPng(w, h, seed)
    }

  /** Pixel-level resize of every payload to targetW×targetH (bilinear,
    * PNG re-encode); undecodable payloads pass through unchanged. */
  def resizedPayload(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
      outCol: String = "resized_payload"): DataFrame =
    withDerived(df, outCol, BinaryType) { row =>
      val bytes = row.getAs[Array[Byte]](binCol)
      val resized = ImageCodec.resizePng(bytes, targetW, targetH)
      if (resized == null) bytes else resized
    }

  /** Metadata-level resize (no byte rewrite — width/height bookkeeping
    * for planning before the heavy [[resizedPayload]] pass). */
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
