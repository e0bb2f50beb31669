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

    // ImageIO defaults to disk-backed image streams (a temp FILE per
    // encode/decode, behind a synchronized cache directory) — with 32
    // executor threads hammering the codec that serializes on I/O.
    // In-memory streams remove the shared resource entirely.
    //
    // CAVEAT: setUseCache is a PROCESS-GLOBAL javax.imageio setting, so
    // any co-resident code using ImageIO in the same JVM inherits it
    // (heap-backed streams buffer whole images in memory — a concern only
    // for images too large for heap). Embedders that need the disk cache
    // can opt out with -Dgraft.imageio.nocache=false; the flag is read
    // once at ImageCodec init.
    if (java.lang.Boolean.parseBoolean(
        System.getProperty("graft.imageio.nocache", "true")))
      javax.imageio.ImageIO.setUseCache(false)

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

  /** audio metadata contract (mirrors [[MetaSchema]] for the image side) */
  val AudioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType)))

  /** JDK-native WAV (RIFF/PCM) codec: a REAL audio format decoded by
    * hand-parsing the RIFF chunk structure — no external libraries, like
    * [[ImageCodec]]'s javax.imageio path. Same totality rule: corrupt
    * payloads yield the documented fallback, never an exception. */
  object AudioCodec extends Serializable {

    private[Multimodal] def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private[Multimodal] def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** Walk the RIFF chunks to the fmt + data blocks:
      * (format, sampleRate, channels, nSamples, durationMs);
      * ("unknown", -1, -1, -1, -1) for anything that is not PCM WAV. */
    def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Long, Long) = {
      val bad = ("unknown", -1, -1, -1L, -1L)
      if (bytes == null || bytes.length < 44) return bad
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
            bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return bad
      // Long chunk walk: a 32-bit size with the high bit set would
      // overflow Int arithmetic, drive pos negative, and turn the
      // "total, never throws" contract into an OOB exception on
      // adversarial bytes
      var pos = 12L
      var rate = -1; var ch = -1; var bps = -1; var dataLen = -1L
      while (pos + 8 <= bytes.length && (rate < 0 || dataLen < 0)) {
        val p = pos.toInt
        val id = new String(bytes, p, 4, "US-ASCII")
        val sz = le32(bytes, p + 4).toLong & 0xffffffffL
        if (id == "fmt " && pos + 24 <= bytes.length) {
          if (le16(bytes, p + 8) != 1) return bad // PCM only
          ch = le16(bytes, p + 10)
          rate = le32(bytes, p + 12)
          bps = le16(bytes, p + 22)
        } else if (id == "data") {
          dataLen = math.min(sz, bytes.length - pos - 8)
        }
        pos += 8L + sz + (sz & 1L) // chunks are word-aligned
        if (sz <= 0 && id != "data") return bad
      }
      if (rate <= 0 || ch <= 0 || bps <= 0 || dataLen < 0) bad
      else {
        val n = dataLen / (ch.toLong * (bps / 8))
        ("wav", rate, ch, n, n * 1000L / rate)
      }
    }

    /** Deterministic PCM16 mono sine WAV (the audio analog of
      * [[ImageCodec.synthPng]]): id-seeded frequency and length. */
    def synthWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val out = new Array[Byte](44 + dataLen)
      def putAscii(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, i)
      def put32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
      def put16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
      putAscii(0, "RIFF"); put32(4, 36 + dataLen); putAscii(8, "WAVE")
      putAscii(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
      put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2); put16(34, 16)
      putAscii(36, "data"); put32(40, dataLen)
      val freq = 110.0 + (math.abs(seed) % 880)
      var i = 0
      while (i < nSamples) {
        val v = (math.sin(2.0 * math.Pi * freq * i / sampleRate) * 12000).toInt
        put16(44 + 2 * i, v)
        i += 1
      }
      out
    }

    /** Seeded chirp with amplitude modulation: frequency sweeps across
      * the clip and the AM pattern is seed-keyed, so every seed has a
      * DISTINCTIVE temporal energy structure — the fixture a
      * gradient-sign fingerprint can discriminate (a stationary pure
      * tone has near-constant per-frame energy and degenerates the
      * along-time gradients to numeric noise). */
    def synthWavSweep(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
      val base = synthWav(sampleRate, nSamples, seed)
      val f0 = 110.0 + (math.abs(seed) * 37 % 700)
      val f1 = f0 * (1.5 + (math.abs(seed) % 5) * 0.35)
      var phase = 0.0
      var i = 0
      while (i < nSamples) {
        val frac = i.toDouble / nSamples
        val freq = f0 + (f1 - f0) * frac
        phase += 2.0 * math.Pi * freq / sampleRate
        // seed-keyed 8-step AM envelope in [0.25, 1.0]
        val step = (i * 8 / math.max(1, nSamples)) & 7
        val amp = 0.25 + 0.75 * (((seed >> (step * 4)) & 0xF).toDouble / 15.0)
        val v = (math.sin(phase) * 12000 * amp).toInt
        base(44 + 2 * i) = v.toByte
        base(45 + 2 * i) = (v >> 8).toByte
        i += 1
      }
      base
    }

    /** Windowed RMS energy + zero-crossing rate over the PCM16 samples
      * ([[FeatureDim]]/2 windows of each): the classic cheap audio
      * descriptor. Non-WAV payloads → zero vector (total). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val (fmt, _, ch, n, _) = decodeMeta(bytes)
      val out = new Array[Float](FeatureDim)
      if (fmt != "wav" || n <= 0) return out
      // locate the data chunk again (decodeMeta validated the layout up
      // to and including it; same Long walk for the same OOB safety)
      var pos = 12L
      var dataPos = -1; var dataLen = 0
      while (pos + 8 <= bytes.length && dataPos < 0) {
        val p = pos.toInt
        val id = new String(bytes, p, 4, "US-ASCII")
        val sz = le32(bytes, p + 4).toLong & 0xffffffffL
        if (id == "data") {
          dataPos = p + 8
          dataLen = math.min(sz, bytes.length - pos - 8).toInt
        }
        pos += 8L + sz + (sz & 1L)
      }
      if (dataPos < 0) return out
      val nSamp = dataLen / 2 // interleaved channels fold into the windows
      val half = FeatureDim / 2
      val win = math.max(1, nSamp / half)
      var w = 0
      while (w < half) {
        val from = w * win
        val to = math.min(nSamp, from + win)
        var sumSq = 0.0; var zc = 0; var prev = 0; var i = from
        while (i < to) {
          val s = (le16(bytes, dataPos + 2 * i) << 16) >> 16 // sign-extend
          sumSq += s.toDouble * s
          if (i > from && ((s >= 0) != (prev >= 0))) zc += 1
          prev = s
          i += 1
        }
        val cnt = math.max(1, to - from)
        out(w) = math.sqrt(sumSq / cnt).toFloat
        out(half + w) = zc.toFloat / cnt
        w += 1
      }
      out
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

  /** Minimal video container: magic "GVID" + frame count + length-prefixed
    * PNG frames (all big-endian ints). Real container PARSING and real
    * per-frame image decode with zero external dependencies — compressed
    * inter-frame codecs (H.264 etc.) are exactly the part that needs a
    * native library, so the container format is ours, while everything a
    * Spark pipeline does with it (split, sample, decode, featurize) is
    * genuine. Total on corrupt payloads like the other codecs. */
  object VideoCodec extends Serializable {
    private val Magic = Array[Byte]('G', 'V', 'I', 'D')

    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    /** Deterministic container of `nFrames` synthesized PNG frames. */
    def synthVideo(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val frames = (0 until nFrames).map(f => ImageCodec.synthPng(w, h, seed * 131 + f))
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Magic)
      def put32(v: Int): Unit =
        bos.write(Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
      put32(nFrames)
      frames.foreach { fr => put32(fr.length); bos.write(fr) }
      bos.toByteArray
    }

    /** Frame count from the header; -1 when not a GVID payload. */
    def frameCount(bytes: Array[Byte]): Int =
      if (bytes == null || bytes.length < 8 ||
        bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D') -1
      else be32(bytes, 4)

    /** Every `every`-th frame's raw payload as (frameIdx, bytes); walks
      * the length prefixes with Long positions (same overflow discipline
      * as the WAV chunk walk). Empty on corrupt payloads. */
    def sampleFrames(bytes: Array[Byte], every: Int): Seq[(Int, Array[Byte])] = {
      val n = frameCount(bytes)
      if (n <= 0 || every <= 0) return Seq.empty
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var pos = 8L
      var f = 0
      while (f < n && pos + 4 <= bytes.length) {
        val len = be32(bytes, pos.toInt).toLong & 0xffffffffL
        if (pos + 4 + len > bytes.length) return out.result() // truncated
        if (f % every == 0)
          out += ((f, java.util.Arrays.copyOfRange(bytes, (pos + 4).toInt, (pos + 4 + len).toInt)))
        pos += 4 + len
        f += 1
      }
      out.result()
    }
  }

  /** ISO base media file format (ISO/IEC 14496-12 — the MP4/MOV box
    * structure): a REAL-WORLD container metadata codec with zero
    * external dependencies, the production counterpart of the synthetic
    * [[VideoCodec]] container. [[Mp4Codec.parseMeta]] walks the box
    * tree (u32 size + 4cc type headers; size==1 → u64 largesize;
    * size==0 → to end of file), reads `ftyp`'s major brand, `moov`/
    * `mvhd`'s movie timescale and duration (versions 0 AND 1 — v1
    * carries 64-bit times), counts `trak` boxes, pulls the video
    * track's `tkhd` pixel dimensions (16.16 fixed point) and each
    * track's `mdia`/`hdlr` handler 4cc. Sample DATA (`mdat`) stays
    * opaque — compressed codec payloads (H.264/AAC) are exactly the
    * part that needs a native library — while every pipeline-side
    * concern (schema, partitioned parse, totality on corrupt or
    * truncated bytes) is real. [[Mp4Codec.synthMp4]] writes the same
    * boxes from the spec (mvhd/tkhd/mdhd auto-upgrade to version 1
    * when a time field exceeds u32), so gate queries round-trip
    * id-derived parameters through a spec-shaped file.
    * Box layouts: ISO/IEC 14496-12 §4.2 (box header), §8.2.2 (mvhd),
    * §8.3.2 (tkhd), §8.4.2 (mdhd), §8.4.3 (hdlr). */
  object Mp4Codec extends Serializable {

    /** parse contract: ("unknown", -1, -1, -1, -1, -1, "") on anything
      * that is not a parseable ISO-BMFF stream */
    val Mp4MetaSchema: StructType = StructType(Seq(
      StructField("brand", StringType),
      StructField("timescale", LongType),
      StructField("duration", LongType),
      StructField("n_tracks", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("handlers", StringType)))

    private def u16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)

    private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      u32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    }

    /** identity transform matrix (§8.2.2.3): 16.16 fixed except the
      * 2.30 w-component */
    private val UnityMatrix: Array[Byte] =
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .flatMap(u32).toArray

    /** Deterministic spec-shaped MP4: ftyp + moov(mvhd, video trak
      * [, audio trak]) + mdat of `payloadBytes` pseudo-random bytes.
      * Time boxes write version 1 (64-bit times) whenever
      * `duration` or `timescale` exceeds u32 — exercising the v1 parse
      * path with replayable arithmetic. */
    def synthMp4(width: Int, height: Int, timescale: Long, duration: Long,
        withAudio: Boolean, payloadBytes: Int, seed: Long): Array[Byte] = {
      val v1 = duration > 0xffffffffL || timescale > 0xffffffffL
      def times(ts: Long, dur: Long): Array[Byte] =
        if (v1) u64(0L) ++ u64(0L) ++ u32(ts) ++ u64(dur)
        else u32(0L) ++ u32(0L) ++ u32(ts) ++ u32(dur)
      val mvhd = box("mvhd",
        Array[Byte](if (v1) 1 else 0, 0, 0, 0), // version + flags
        times(timescale, duration),
        u32(0x00010000L), u16(0x0100), u16(0), u32(0L), u32(0L), // rate, volume, reserved
        UnityMatrix,
        u32(0L), u32(0L), u32(0L), u32(0L), u32(0L), u32(0L), // pre_defined
        u32(if (withAudio) 3L else 2L)) // next_track_ID
      def tkhd(trackId: Long, w: Int, h: Int, volume: Int): Array[Byte] = box("tkhd",
        Array[Byte](if (v1) 1 else 0, 0, 0, 3), // flags: enabled | in_movie
        (if (v1) u64(0L) ++ u64(0L) ++ u32(trackId) ++ u32(0L) ++ u64(duration)
         else u32(0L) ++ u32(0L) ++ u32(trackId) ++ u32(0L) ++ u32(duration)),
        u32(0L), u32(0L), // reserved
        u16(0), u16(0), u16(volume), u16(0), // layer, alternate_group, volume
        UnityMatrix,
        u32(w.toLong << 16), u32(h.toLong << 16)) // 16.16 fixed point
      def mdia(handler: String, name: String): Array[Byte] = box("mdia",
        box("mdhd",
          Array[Byte](if (v1) 1 else 0, 0, 0, 0),
          times(timescale, duration),
          u16(0x55c4), u16(0)), // language 'und' packed ISO-639-2
        box("hdlr",
          Array[Byte](0, 0, 0, 0), u32(0L),
          handler.getBytes("US-ASCII"),
          u32(0L), u32(0L), u32(0L),
          (name + "\u0000").getBytes("US-ASCII")))
      val videoTrak = box("trak", tkhd(1L, width, height, 0), mdia("vide", "VideoHandler"))
      val audioTrak =
        if (!withAudio) Array.empty[Byte]
        else box("trak", tkhd(2L, 0, 0, 0x0100), mdia("soun", "SoundHandler"))
      val moov = box("moov", mvhd, videoTrak, audioTrak)
      val rnd = new scala.util.Random(seed)
      val payload = new Array[Byte](math.max(0, payloadBytes))
      rnd.nextBytes(payload)
      box("ftyp", "isom".getBytes("US-ASCII"), u32(0x200L),
        "isom".getBytes("US-ASCII"), "iso2".getBytes("US-ASCII")) ++
        moov ++ box("mdat", payload)
    }

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)

    /** Walk the boxes in [from, to): calls f(type, payloadStart,
      * boxEnd) per box. Total: stops on truncation, non-advancing or
      * overflowing sizes. Payload start skips a largesize when
      * size==1. */
    private def walk(b: Array[Byte], from: Long, to: Long)(
        f: (String, Long, Long) => Unit): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val size0 = be32(b, pos.toInt)
        val tpe = new String(b, pos.toInt + 4, 4, "US-ASCII")
        val (size, hdr) =
          if (size0 == 1L) {
            if (pos + 16 > to) return
            (be64(b, pos.toInt + 8), 16L)
          } else if (size0 == 0L) (to - pos, 8L)
          else (size0, 8L)
        if (size < hdr || pos + size > to) return
        f(tpe, pos + hdr, pos + size)
        pos += size
      }
    }

    /** (brand, timescale, duration, n_tracks, video width, video
      * height, handler 4ccs in file order comma-joined); the unknown
      * tuple on undecodable bytes. */
    def parseMeta(bytes: Array[Byte]): (String, Long, Long, Int, Int, Int, String) = {
      val unknown = ("unknown", -1L, -1L, -1, -1, -1, "")
      if (bytes == null || bytes.length < 8) return unknown
      try {
        var brand: String = null
        var timescale = -1L; var duration = -1L
        var nTracks = 0; var width = -1; var height = -1
        val handlers = Seq.newBuilder[String]
        var sawMoov = false
        walk(bytes, 0L, bytes.length.toLong) { (tpe, p, end) =>
          tpe match {
            case "ftyp" if end - p >= 4 =>
              brand = new String(bytes, p.toInt, 4, "US-ASCII")
            case "moov" =>
              sawMoov = true
              walk(bytes, p, end) { (t2, p2, end2) =>
                t2 match {
                  case "mvhd" if end2 - p2 >= 4 =>
                    val v = bytes(p2.toInt) & 0xff
                    if (v == 1 && end2 - p2 >= 32) {
                      timescale = be32(bytes, p2.toInt + 20)
                      duration = be64(bytes, p2.toInt + 24)
                    } else if (v == 0 && end2 - p2 >= 24) {
                      timescale = be32(bytes, p2.toInt + 12)
                      duration = be32(bytes, p2.toInt + 16)
                    }
                  case "trak" =>
                    nTracks += 1
                    var w = -1; var h = -1; var handler: String = null
                    walk(bytes, p2, end2) { (t3, p3, end3) =>
                      t3 match {
                        case "tkhd" if end3 - p3 >= 4 =>
                          val v = bytes(p3.toInt) & 0xff
                          // §8.3.2: matrix ends 8 bytes before the box
                          // end in both versions — width/height are the
                          // LAST two u32 fields, version-independent
                          // when read from the tail
                          if ((v == 0 && end3 - p3 >= 84) || (v == 1 && end3 - p3 >= 96)) {
                            w = (be32(bytes, end3.toInt - 8) >>> 16).toInt
                            h = (be32(bytes, end3.toInt - 4) >>> 16).toInt
                          }
                        case "mdia" =>
                          walk(bytes, p3, end3) { (t4, p4, end4) =>
                            if (t4 == "hdlr" && end4 - p4 >= 12)
                              handler = new String(bytes, p4.toInt + 8, 4, "US-ASCII")
                          }
                        case _ =>
                      }
                    }
                    if (handler != null) handlers += handler
                    if (handler == "vide" && width < 0) { width = w; height = h }
                  case _ =>
                }
              }
            case _ =>
          }
        }
        if (brand == null && !sawMoov) unknown
        else (if (brand == null) "unknown" else brand,
          timescale, duration, nTracks, width, height,
          handlers.result().mkString(","))
      } catch { case _: Exception => unknown }
    }

    /** [[parseMeta]] as a [[Mp4MetaSchema]] row for `deriveMany`. */
    def parseMetaRow(bytes: Array[Byte]): Row = {
      val (b, ts, d, n, w, h, hs) = parseMeta(bytes)
      Row(b, ts, d, n, w, h, hs)
    }
  }

  /** Explode a video column into sampled decoded frames: one output row
    * per sampled frame with (frame_idx, frame meta struct) — container
    * split, frame decode, and the explode all happen in ONE
    * mapPartitions pass; frame payloads never leave the partition. */
  def explodeSampledFrames(df: DataFrame, binCol: String, every: Int,
      idxCol: String = "frame_idx", metaCol: String = "frame_meta"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
      .add(idxCol, IntegerType).add(metaCol, MetaSchema)
    val rdd = df.rdd.mapPartitions(it => it.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](binCol)
      VideoCodec.sampleFrames(bytes, every).map { case (idx, frame) =>
        val (fmt, w, h, c) = ImageCodec.decodeMeta(frame)
        Row.fromSeq(row.toSeq ++ Seq(idx, Row(fmt, w, h, c, frame.length.toLong)))
      }
    })
    spark.createDataFrame(rdd, schema)
  }

  /** One mapPartitions pass appending SEVERAL derived columns at once.
    * Chaining single-column derivations crosses an RDD boundary per step
    * — every payload column re-serializes each time, which dominates the
    * cost when the payloads are megabyte media blobs. Decode once, emit
    * every derived column together. */
  def deriveMany(df: DataFrame, outs: Seq[(String, DataType)])(
      f: Row => Seq[Any]): DataFrame = {
    val spark = df.sparkSession
    val schema = outs.foldLeft(df.schema) { case (s, (n, t)) => s.add(n, t) }
    val rdd = df.rdd.mapPartitions(it => it.map(row => Row.fromSeq(row.toSeq ++ f(row))))
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

  /** 64-bit perceptual difference hash (dHash — the standard
    * re-encode/resize-robust image fingerprint): decode, area-average
    * down to a 9×8 grayscale grid (integer sums — fully deterministic),
    * then one bit per horizontal gradient sign. Visually identical
    * images land within a few bits even across re-encodes and
    * resamples; unrelated images sit ~32 bits apart. Undecodable
    * payloads fall back to the byte-window analog (the
    * byteMomentFeatures contract — rows never silently drop). */
  def dHashBytes(bytes: Array[Byte]): Long = {
    val img =
      try {
        if (bytes == null || bytes.isEmpty) null
        else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      } catch { case _: Exception => null }
    val cells = Array.ofDim[Long](8, 9)
    if (img != null && img.getWidth > 0 && img.getHeight > 0) {
      val cnt = Array.ofDim[Long](8, 9)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        val gy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val gx = math.min(8, x * 9 / w)
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          cells(gy)(gx) += lum
          cnt(gy)(gx) += 1
          x += 1
        }
        y += 1
      }
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          if (cnt(gy)(gx) > 0) cells(gy)(gx) /= cnt(gy)(gx)
          gx += 1
        }
        gy += 1
      }
    } else if (bytes != null && bytes.nonEmpty) {
      // byte-window analog: 72 windowed byte sums in the same grid
      var i = 0
      while (i < bytes.length) {
        val cell = i % 72
        cells(cell / 9)(cell % 9) += (bytes(i) & 0xFF)
        i += 1
      }
    }
    var hash = 0L
    var bit = 0
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cells(gy)(gx) > cells(gy)(gx + 1)) hash |= (1L << bit)
        bit += 1
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** dHash as a column over a binary payload column. */
  def dHash(binCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) => dHashBytes(b)).apply(binCol)

  /** Shared banded 64-bit Hamming near-dup skeleton (the
    * [[Dedup.simHashPairs]] shape): 4×16-bit bands guarantee every pair
    * at Hamming ≤ 3 collides in some band (pigeonhole); candidates
    * verify exactly with one popcount. Payloads never join — only
    * (id, 64-bit hash) shuffles. */
  private def bandedHammingPairs(df: DataFrame, idCol: String,
      hashCol: org.apache.spark.sql.Column, maxHamming: Int): DataFrame = {
    import scala.util.chaining._
    val shuffleP = df.sparkSession.sessionState.conf.numShufflePartitions
    val withSig = df
      .repartition(shuffleP, col(idCol))
      .withColumn("__ph", hashCol)
      .select(col(idCol), col("__ph"))
      .pipe(graft.core.CacheScope.retain)
    val banded = withSig.select(col(idCol), col("__ph"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("__ph"), b * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("e"))
      .select(col(idCol), col("__ph"), col("e.band"), col("e.key"))
    val l = banded.alias("l"); val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("l.__ph").as("ph_a"), col("r.__ph").as("ph_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Image near-duplicate pairs by dHash Hamming distance. */
  def imageNearDupPairs(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(df, idCol, dHash(col(binCol)), maxHamming)

  /** Video near-duplicate pairs: dHash every `every`-th frame and
    * match clips POSITIONALLY — two clips pair when at least
    * `minMatchFrac` of their sampled frame positions carry dHashes
    * within `maxHamming` bits. The per-frame candidate join runs the
    * banded-Hamming skeleton with the frame index folded into the band
    * key, so only same-position frames ever compare and the quadratic
    * frame blow-up never materializes; frame PAYLOADS never shuffle —
    * (id, frame_idx, 64-bit hash) does. Positional matching trades
    * shift robustness for exactness (the sampling stride absorbs small
    * offsets); re-encoded/resized duplicates ride the dHash tolerance. */
  def videoNearDupPairs(df: DataFrame, binCol: String, idCol: String,
      every: Int = 2, maxHamming: Int = 3,
      minMatchFrac: Double = 0.5): DataFrame = {
    import scala.util.chaining._
    val shuffleP = df.sparkSession.sessionState.conf.numShufflePartitions
    val fh = udf((b: Array[Byte]) =>
      VideoCodec.sampleFrames(b, every).map { case (i, fr) => (i, dHashBytes(fr)) })
    val frames = df
      .repartition(shuffleP, col(idCol))
      .select(col(idCol), explode(fh(col(binCol))).as("__f"))
      .select(col(idCol), col("__f._1").as("__fi"), col("__f._2").as("__ph"))
      .pipe(graft.core.CacheScope.retain)
    val counts = frames.groupBy(col(idCol)).agg(count(lit(1)).as("__nf"))
    val banded = frames.select(col(idCol), col("__fi"), col("__ph"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("__ph"), b * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("e"))
      .select(col(idCol), col("__fi"), col("__ph"), col("e.band"), col("e.key"))
    val l = banded.alias("l"); val r = banded.alias("r")
    val framePairs = l.join(r,
        col("l.__fi") === col("r.__fi") && col("l.band") === col("r.band") &&
          col("l.key") === col("r.key") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        col("l.__fi").as("__fi"), col("l.__ph").as("ph_a"), col("r.__ph").as("ph_b"))
      .dropDuplicates("id_a", "id_b", "__fi")
      .where(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= maxHamming)
    framePairs.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matched"))
      .join(counts.withColumnRenamed(idCol, "id_a").withColumnRenamed("__nf", "__nfa"), "id_a")
      .join(counts.withColumnRenamed(idCol, "id_b").withColumnRenamed("__nf", "__nfb"), "id_b")
      .withColumn("n_frames", least(col("__nfa"), col("__nfb")))
      .where(col("n_matched") >= ceil(col("n_frames") * lit(minMatchFrac)))
      .select("id_a", "id_b", "n_matched", "n_frames")
  }

  /** 64-bit perceptual audio fingerprint (chromaprint-style, FFT-free):
    * a Goertzel filterbank measures energy at 8 fixed frequencies over
    * 9 time frames; one bit per along-time energy gradient sign.
    * Volume-invariant by construction (uniform gain preserves every
    * gradient sign) and robust to re-encoding; unrelated audio sits
    * ~32 bits apart. Non-WAV payloads fall back to the byte-window
    * analog (rows never silently drop). */
  def audioHashBytes(bytes: Array[Byte]): Long = {
    val (fmt, rate, _, n, _) = AudioCodec.decodeMeta(bytes)
    val grid = Array.ofDim[Double](8, 9)
    var decoded = false
    if (fmt == "wav" && n > 0 && rate > 0) {
      // find the data chunk (the AudioCodec.features walk)
      var pos = 12L
      var dataPos = -1; var dataLen = 0
      while (pos + 8 <= bytes.length && dataPos < 0) {
        val p = pos.toInt
        val id = new String(bytes, p, 4, "US-ASCII")
        val sz = (AudioCodec.le32(bytes, p + 4)).toLong & 0xffffffffL
        if (id == "data") {
          dataPos = p + 8
          dataLen = math.min(sz, bytes.length - pos - 8).toInt
        }
        pos += 8L + sz + (sz & 1L)
      }
      val nSamp = dataLen / 2
      if (dataPos >= 0 && nSamp > 0) {
        decoded = true
        val frame = math.max(1, nSamp / 9)
        val nyq = rate / 2.0
        var b = 0
        while (b < 8) {
          // 150 Hz · 2^(b/2), capped under Nyquist
          val freq = math.min(nyq * 0.9, 150.0 * math.pow(2.0, b / 2.0))
          val coeff = 2.0 * math.cos(2.0 * math.Pi * freq / rate)
          var t = 0
          while (t < 9) {
            val from = t * frame
            val to = if (t == 8) nSamp else math.min(nSamp, from + frame)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
            var i = from
            while (i < to) {
              val samp = ((AudioCodec.le16(bytes, dataPos + 2 * i) << 16) >> 16).toDouble
              s0 = samp + coeff * s1 - s2
              s2 = s1; s1 = s0
              i += 1
            }
            grid(b)(t) = s1 * s1 + s2 * s2 - coeff * s1 * s2
            t += 1
          }
          b += 1
        }
      }
    }
    if (!decoded && bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) {
        val cell = i % 72
        grid(cell / 9)(cell % 9) += (bytes(i) & 0xFF)
        i += 1
      }
    }
    var hash = 0L
    var bit = 0
    var b = 0
    while (b < 8) {
      var t = 0
      while (t < 8) {
        if (grid(b)(t) > grid(b)(t + 1)) hash |= (1L << bit)
        bit += 1
        t += 1
      }
      b += 1
    }
    hash
  }

  /** audioHash as a column over a binary payload column. */
  def audioHash(binCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((b: Array[Byte]) => audioHashBytes(b)).apply(binCol)

  /** Audio near-duplicate pairs by fingerprint Hamming distance (the
    * same banded skeleton as [[imageNearDupPairs]]). */
  def audioNearDupPairs(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(df, idCol, audioHash(col(binCol)), maxHamming)

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

  /** Attach audio metadata decoded from a WAV binary column. */
  def withAudioMeta(df: DataFrame, binCol: String, outCol: String = "audio_meta"): DataFrame =
    withDerived(df, outCol, AudioMetaSchema) { row =>
      val bytes = row.getAs[Array[Byte]](binCol)
      val (fmt, rate, ch, n, ms) = AudioCodec.decodeMeta(bytes)
      Row(fmt, rate, ch, n, ms)
    }

  /** Attach windowed RMS/zero-crossing audio features (same batched
    * iterator shape as the image featurizer). */
  def withAudioFeatures(df: DataFrame, binCol: String, outCol: String = "audio_features"): DataFrame =
    withDerived(df, outCol, ArrayType(FloatType)) { row =>
      AudioCodec.features(row.getAs[Array[Byte]](binCol)).toSeq
    }

  /** Synthesize deterministic WAV payloads (id-seeded tone + length). */
  def withSyntheticWav(df: DataFrame, rateCol: String, nSamplesCol: String,
      outCol: String = "audio_payload", seedCol: Option[String] = None): DataFrame =
    withDerived(df, outCol, BinaryType) { row =>
      val rate = row.getAs[Int](rateCol)
      val n = row.getAs[Int](nSamplesCol)
      val seed = seedCol.map(c => row.getAs[Long](c)).getOrElse(rate.toLong * 31 + n)
      AudioCodec.synthWav(rate, n, seed)
    }

  /** Frame sampling for a (fake) video track: every nth frame index up to
    * `maxFrames` — demonstrates the explode-to-frames shape. */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int, every: Int): DataFrame =
    df.select(col(idCol),
      explode(sequence(lit(0), lit((nFrames - 1) * every), lit(every))).as("frame_idx"))
}
