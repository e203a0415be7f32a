package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2c X5): image/audio/video as opaque
  * `binary` columns + typed metadata, processed with per-partition batch
  * transforms — the Scala/Dataset analog of `mapInPandas` batch UDFs.
  *
  * The kernels dispatch on the payload's magic bytes:
  *  - PNG (and any other `javax.imageio` format — BMP, GIF; the JDK ships
  *    these, no external deps): REAL decode and REAL resample;
  *  - the `GRFT` synthetic header: a deterministic fake payload, kept for
  *    the byte-exact DuckDB-oracled gate entries (x05c/x05d) and as the
  *    stand-in for codecs the JDK lacks (JPEG2000, video — those remain the
  *    documented swap-point, clearly marked below).
  * Everything around the kernels — schema, encoders, batch shape,
  * partitioning, null handling — is identical for both paths.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata (X5 data model). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Deterministic fake payload: 16-byte header (magic, width, height,
    * n_frames derived from the id) followed by pseudo-random bytes. Stands in
    * for a real image/video blob so the binary-column path is exercised with
    * verifiable content. */
  def synthesize(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    val w = (pmod(id, lit(64)) + 1) * 8
    val h = (pmod(id * 7L, lit(64)) + 1) * 8
    val f = pmod(id, lit(16)) + 1
    // header = "GRFT" + 3 big-endian ints; body = hash bytes
    val header = concat(
      lit("GRFT").cast(BinaryType),
      intBytes(w), intBytes(h), intBytes(f))
    df.select(id.as("media_id"),
      concat_ws("/", lit("image"), lit("synthetic")).as("mime"),
      concat(header, unhex(sha2(id.cast("string"), 256))).as("content"),
      struct(w.cast("int").as("width"), h.cast("int").as("height"),
        f.cast("int").as("n_frames")).as("meta"))
  }

  private def intBytes(v: org.apache.spark.sql.Column) = {
    val x = v.cast("long")
    concat(
      chrByte(shiftright(x, 24)), chrByte(shiftright(x, 16)),
      chrByte(shiftright(x, 8)), chrByte(x))
  }
  private def chrByte(v: org.apache.spark.sql.Column) =
    unhex(lpad(hex(pmod(v, lit(256))), 2, "0"))

  final case class DecodedFeatures(
      media_id: Long, width: Int, height: Int, n_frames: Int,
      feature: Array[Double])

  /** Per-partition batch decode — the `mapInPandas` analog: one iterator in,
    * one iterator out, so the decoder amortizes codec setup per partition
    * (exactly where a JNI/ONNX session would be opened once).
    *
    * `decodeOne` dispatches on magic: real images decode through the JDK's
    * ImageIO (4-dim feature = per-channel means + luminance); `GRFT`
    * payloads parse the synthetic header. Adding a non-JDK codec swaps ONLY
    * the kernel body — signature, batching, schema and partitioning stay
    * identical. */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition setup would go here (codec init, model session, ...)
        batch.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  final case class AudioWindow(media_id: Long, window_id: Int, n_samples: Int,
                               rms: Double, peak: Double, zcr: Double)

  /** AUDIO window features over raw 16-bit little-endian PCM — the audio
    * leg of the multimodal plumbing, and unlike image codecs it needs NO
    * library: PCM "decoding" is two bytes → one sample, so this kernel is
    * fully real, not a stub. Per non-overlapping window of `windowSamples`
    * samples: RMS and peak amplitude (normalized to [0, 1] by the int16
    * range) and zero-crossing RATE (fraction of adjacent same-window pairs
    * that change sign — the classic cheap pitch/noisiness proxy). The last
    * window may be short (its true `n_samples` is carried); a trailing odd
    * byte is ignored; empty/NULL content yields no windows.
    *
    * Same per-partition batch shape as [[decodeFeatures]] (one iterator
    * in/out — where a resampler or codec session would init once); output
    * rows are windows, so downstream windowed aggregations (per-track
    * loudness profiles, silence trimming, VAD-style gates) stay
    * relational. */
  def pcmWindowFeatures(media: DataFrame, windowSamples: Int)
                       (implicit spark: SparkSession): Dataset[AudioWindow] = {
    require(windowSamples >= 2, s"windowSamples must be >= 2, got $windowSamples")
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .filter(_._2 != null)
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val n = bytes.length / 2
          (0 until n by windowSamples).iterator.zipWithIndex.map {
            case (start, w) =>
              val end = math.min(start + windowSamples, n)
              var sumSq = 0.0; var peak = 0.0; var crossings = 0
              // crossings compare consecutive NONZERO samples' signs — an
              // exact-zero sample (common when the sample grid hits the
              // waveform's zeros) must neither suppress nor double-count
              // the crossing it sits on
              var lastSign = 0; var i = start
              while (i < end) {
                val s = (((bytes(2 * i + 1) & 0xFF) << 8) |
                  (bytes(2 * i) & 0xFF)).toShort / 32768.0
                sumSq += s * s
                val a = math.abs(s); if (a > peak) peak = a
                if (s != 0.0) {
                  val sign = if (s > 0) 1 else -1
                  if (lastSign != 0 && sign != lastSign) crossings += 1
                  lastSign = sign
                }
                i += 1
              }
              val len = end - start
              AudioWindow(id, w, len, math.sqrt(sumSq / len), peak,
                if (len > 1) crossings.toDouble / (len - 1) else 0.0)
          }
        }
      }
  }

  /** Synthesize 16-bit LE PCM for a sine wave — deterministic audio test
    * signal (the audio sibling of [[synthesize]]'s GRFT blobs). */
  def sinePcm(freqHz: Double, sampleRate: Int, nSamples: Int,
              amplitude: Double = 0.5): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= 1.0, "amplitude in [0,1]")
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate)
        * 32767.0).toInt
      out(2 * i) = (v & 0xFF).toByte
      out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  private def isGrft(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 && bytes(0) == 'G' && bytes(1) == 'R' &&
      bytes(2) == 'F' && bytes(3) == 'T'

  /** Decode kernel: ImageIO for real image bytes, header parse for `GRFT`. */
  private def decodeOne(id: Long, bytes: Array[Byte]): DecodedFeatures =
    if (isGrft(bytes)) {
      def be(off: Int): Int =
        ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      val body = bytes.drop(16)
      val feat = Array.tabulate(4)(i =>
        body.iterator.drop(i).grouped(4).map(_.head & 0xff).sum.toDouble / body.length)
      DecodedFeatures(id, be(4), be(8), be(12), feat)
    } else {
      // REAL codec path: javax.imageio ships in the JDK (PNG/BMP/GIF need
      // no external deps). Feature = mean R, G, B plus BT.601 luminance,
      // all normalized to [0,1] — deterministic for a given payload.
      val img = readImage(id, bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = 255.0 * w * h
      DecodedFeatures(id, w, h, 1,
        Array(r / n, g / n, b / n, (0.299 * r + 0.587 * g + 0.114 * b) / n))
    }

  private def readImage(id: Long, bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"media $id: payload is neither a GRFT header nor a JDK-decodable image")
    img
  }

  final case class ResizedMedia(media_id: Long, mime: String,
                                content: Array[Byte], width: Int, height: Int)

  /** Batch resize — a binary→binary per-partition transform with refreshed
    * metadata, the second `mapInPandas`-shaped kernel (decode is the first).
    *
    * Real images resample through Graphics2D (bilinear) and re-encode as
    * PNG; `GRFT` payloads rewrite the synthetic header's dimensions and keep
    * the body (deterministic, byte-exact — the x05d oracle's path). Either
    * way decode-of-a-resize reports the new dims, so header/metadata
    * consistency is verifiable end-to-end. */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    media.select("media_id", "mime", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition setup (image library init) would go here
        batch.map { case (id, mime, bytes) =>
          if (isGrft(bytes)) {
            val out = bytes.clone()
            writeBe(out, 4, targetW)
            writeBe(out, 8, targetH)
            ResizedMedia(id, mime, out, targetW, targetH)
          } else {
            val src = readImage(id, bytes)
            val dst = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gfx = dst.createGraphics()
            try {
              gfx.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              gfx.drawImage(src, 0, 0, targetW, targetH, null)
            } finally gfx.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            ResizedMedia(id, mime, bos.toByteArray, targetW, targetH)
          }
        }
      }
  }

  private def writeBe(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = ((v >>> 24) & 0xff).toByte
    buf(off + 1) = ((v >>> 16) & 0xff).toByte
    buf(off + 2) = ((v >>> 8) & 0xff).toByte
    buf(off + 3) = (v & 0xff).toByte
  }

  final case class MediaHash(media_id: Long, ahash: Long)

  /** 64-bit perceptual average-hash per media row — the image analog of
    * simhash: near-identical images (recompressed, slightly resized,
    * brightness-shifted) land within a few bits, so image-level dedup of a
    * training corpus becomes the SAME banded hamming join the text path
    * uses ([[NearDup.hammingPairs64]]).
    *
    * Real images (ImageIO-decodable): classic aHash — area-mean BT.601
    * luminance on an 8×8 grid, threshold at the grid mean, bits packed
    * row-major MSB-first. `GRFT` synthetic payloads hash their body's first
    * 64 nibbles (bit = nibble ≥ 8) — deterministic, SQL-derivable (the
    * x33 oracle recomputes it from sha256 hex in DuckDB), and invariant
    * under the synthetic resize (which rewrites only the header), so the
    * pipeline property "resize must not change the perceptual hash" is
    * testable byte-exactly on the synthetic path and approximately on the
    * real one. */
  def averageHash(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaHash] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) => MediaHash(id, hashOne(id, bytes)) }
      }
  }

  private def hashOne(id: Long, bytes: Array[Byte]): Long =
    if (isGrft(bytes)) {
      val body = bytes.drop(16)
      require(body.nonEmpty, s"media $id: GRFT payload has no body")
      var h = 0L
      var i = 0
      while (i < 64) {
        val b = body((i / 2) % body.length)
        val nib = if (i % 2 == 0) (b >>> 4) & 0xf else b & 0xf
        h = (h << 1) | (if (nib >= 8) 1L else 0L)
        i += 1
      }
      h
    } else {
      val img = readImage(id, bytes)
      val (w, hgt) = (img.getWidth, img.getHeight)
      val cells = new Array[Double](64)
      var cy = 0
      while (cy < 8) {
        val y0 = cy * hgt / 8
        val y1 = math.max(y0 + 1, (cy + 1) * hgt / 8)
        var cx = 0
        while (cx < 8) {
          val x0 = cx * w / 8
          val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
          var sum = 0.0
          var y = y0
          while (y < math.min(y1, hgt)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val p = img.getRGB(x, y)
              sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
                0.114 * (p & 0xff)
              x += 1
            }
            y += 1
          }
          val px = (math.min(x1, w) - x0).max(1) * (math.min(y1, hgt) - y0).max(1)
          cells(cy * 8 + cx) = sum / px
          cx += 1
        }
        cy += 1
      }
      val mean = cells.sum / 64.0
      var h = 0L
      var i = 0
      while (i < 64) {
        h = (h << 1) | (if (cells(i) > mean) 1L else 0L)
        i += 1
      }
      h
    }

  /** Image near-duplicate pairs: [[averageHash]] + the banded hamming join.
    * One decode pass, one narrow shuffle — the multimodal spelling of
    * simhash dedup, at any corpus size. */
  def imageNearDupPairs(media: DataFrame, maxBits: Int = 3)
                       (implicit spark: SparkSession): DataFrame =
    NearDup.hammingPairs64(averageHash(media).toDF(), "media_id", "ahash", maxBits)

  /** Frame sampling plan for video-shaped media: explode frame indices from
    * metadata WITHOUT touching payload bytes (column pruning keeps `content`
    * out of the scan when only frame plans are needed). */
  def sampleFramePlan(media: DataFrame, everyN: Int = 2): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN))).as("frame_idx"))
      .select("media_id", "frame_idx")

  /** EXACTLY-k uniform frame sampling — the fixed-budget sibling of
    * [[sampleFramePlan]]'s stride (a video-text model wants k frames per
    * clip regardless of clip length): frame indices
    * `idx_j = ⌊j·n_frames/k⌋, j = 0..k−1`, deduplicated when a short clip
    * makes indices coincide (each surviving frame once, `sample_ord` = its
    * position in the deduplicated ascending list). Map-only — the
    * transform/dedup/explode runs inside the row, no shuffle, no window.
    *
    * `fake_luma` is the DETERMINISTIC FAKE standing in for the per-frame
    * decode (the container has no video codecs — the documented stub tier
    * of this file): `(media_id·31 + frame_idx·7) mod 256`. A real
    * deployment swaps it for a `mapPartitions` decode exactly like
    * [[resize]]'s; the sampling arithmetic, row shape, and dedup contract
    * — the Spark-side plumbing — are the real, tested surface. */
  def frameSampleUniform(media: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    media.select(col("media_id"),
        posexplode(array_distinct(expr(
          s"transform(sequence(0, ${k - 1}), " +
            s"j -> (CAST(j AS BIGINT) * CAST(meta.n_frames AS BIGINT)) div $k)")))
          .as(Seq("sample_ord", "frame_idx")))
      .select(col("media_id"), col("sample_ord").cast("long").as("sample_ord"),
        col("frame_idx"),
        pmod(col("media_id") * 31 + col("frame_idx") * 7, lit(256))
          .as("fake_luma"))
  }
}
