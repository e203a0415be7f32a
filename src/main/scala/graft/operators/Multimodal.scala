package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2c X5): image/audio/video as opaque
  * `binary` columns + typed metadata, processed with per-partition batch
  * transforms — the Scala/Dataset analog of `mapInPandas` batch UDFs.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are deterministic STUBS (clearly marked below) that parse a
  * fake 16-byte header. Everything around them — schema, encoders, batch
  * shape, partitioning, null handling — is real Spark plumbing and is what a
  * production decoder would drop into.
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
    * one iterator out, so a real decoder can amortize codec/model setup per
    * partition (exactly where a JNI/ONNX session would be opened once).
    *
    * ??? STUB ???: `decodeOne` parses the fake header and emits a 4-dim
    * feature from the payload bytes. A real implementation swaps ONLY the
    * body of `decodeOne` for an actual codec call — signature, batching,
    * schema and partitioning stay identical. */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition setup would go here (codec init, model session, ...)
        batch.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** STUB decode kernel — deterministic fake in lieu of a real codec. */
  private def decodeOne(id: Long, bytes: Array[Byte]): DecodedFeatures = {
    require(bytes.length >= 16 && new String(bytes.slice(0, 4), "US-ASCII") == "GRFT",
      s"media $id: bad magic")
    def be(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    val body = bytes.drop(16)
    val feat = Array.tabulate(4)(i =>
      body.iterator.drop(i).grouped(4).map(_.head & 0xff).sum.toDouble / body.length)
    DecodedFeatures(id, be(4), be(8), be(12), feat)
  }

  final case class ResizedMedia(media_id: Long, mime: String,
                                content: Array[Byte], width: Int, height: Int)

  /** Batch resize — a binary→binary per-partition transform with refreshed
    * metadata, the second `mapInPandas`-shaped kernel (decode is the first).
    *
    * ??? STUB ???: a real resampler would transform the pixel payload; here
    * the kernel rewrites the fake header's dimensions and keeps the body, so
    * the transform is deterministic and header/metadata consistency is
    * verifiable end-to-end (decode of a resize reports the new dims). The
    * batching, schema, and meta-refresh plumbing are the production shape. */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    media.select("media_id", "mime", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition setup (image library init) would go here
        batch.map { case (id, mime, bytes) =>
          require(bytes.length >= 16 &&
            new String(bytes.slice(0, 4), "US-ASCII") == "GRFT",
            s"media $id: bad magic")
          val out = bytes.clone()
          writeBe(out, 4, targetW)
          writeBe(out, 8, targetH)
          ResizedMedia(id, mime, out, targetW, targetH)
        }
      }
  }

  private def writeBe(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = ((v >>> 24) & 0xff).toByte
    buf(off + 1) = ((v >>> 16) & 0xff).toByte
    buf(off + 2) = ((v >>> 8) & 0xff).toByte
    buf(off + 3) = (v & 0xff).toByte
  }

  /** Frame sampling plan for video-shaped media: explode frame indices from
    * metadata WITHOUT touching payload bytes (column pruning keeps `content`
    * out of the scan when only frame plans are needed). */
  def sampleFramePlan(media: DataFrame, everyN: Int = 2): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN))).as("frame_idx"))
      .select("media_id", "frame_idx")
}
