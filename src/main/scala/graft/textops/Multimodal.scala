package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media (image/audio/video) carried as opaque
 * `binary` columns with a typed metadata struct, processed in partition-
 * local batches.
 *
 * The actual codec work (JPEG decode, resampling, frame extraction) is
 * STUBBED with deterministic fakes — no image/audio libraries exist in
 * this environment — but everything Spark-side is real and load-bearing:
 * the schema contract, the per-partition batched iteration (the Scala
 * analog of `mapInPandas` batch shape), partition sizing, and the typed
 * Encoders. Swapping the stub for a real decoder changes one function.
 */
object Multimodal {

  final case class MediaMeta(kind: String, bytes: Long, width: Int, height: Int,
      channels: Int, durationMs: Long)
  final case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, kind: String, features: Array[Float],
      frameCount: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType), StructField("bytes", LongType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType), StructField("durationMs", LongType))))))

  /** STUB decode: deterministic pseudo-metadata from the byte content.
    * Replace with a real probe (e.g. image header parse) in production. */
  def decodeStub(kind: String, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    val h = scala.util.hashing.MurmurHash3.bytesHash(if (bytes == null) Array.empty else bytes, 42)
    MediaMeta(kind, n, 64 + math.abs(h % 1216), 64 + math.abs((h / 7) % 656),
      3, if (kind == "video" || kind == "audio") n / 16 else 0L)
  }

  /** STUB feature extraction: a deterministic dim-`d` float vector derived
    * from rolling byte windows (stands in for an encoder forward pass). */
  def featuresStub(bytes: Array[Byte], d: Int = 16): Array[Float] = {
    val out = new Array[Float](d)
    if (bytes != null && bytes.length > 0) {
      var i = 0
      while (i < bytes.length) {
        out(i % d) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(1, bytes.length / d)
      var j = 0
      while (j < d) { out(j) /= n; j += 1 }
    }
    out
  }

  /** STUB frame sampling for video-kind media: every `strideBytes` window
    * counts as one frame (real impl: keyframe extraction). */
  def frameCountStub(meta: MediaMeta, strideBytes: Int = 4096): Int =
    if (meta.durationMs > 0) math.max(1, (meta.bytes / strideBytes).toInt) else 1

  /**
   * Batched per-partition feature extraction — the Scala mapPartitions
   * analog of `mapInPandas`: rows are processed in bounded batches so a
   * real decoder could amortize model setup per batch and bound memory.
   */
  def extractFeatures(ds: Dataset[MediaRow], batchSize: Int = 64, dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder/model init)
        batch.iterator.map { r =>
          MediaFeatures(r.id, r.meta.kind, featuresStub(r.media, dim),
            frameCountStub(r.meta))
        }
      }
    }
  }

  /** STUB resize: deterministic byte subsampling to the target pixel count
    * (real impl: bilinear/Lanczos). Output meta reflects the new geometry;
    * output bytes are a strided sample so downstream hashing/dedup of the
    * "resized" media stays deterministic. */
  def resizeStub(row: MediaRow, maxW: Int, maxH: Int): MediaRow = {
    val m = row.meta
    if (m.width <= maxW && m.height <= maxH) return row
    val scale = math.min(maxW.toDouble / m.width, maxH.toDouble / m.height)
    val (w, h) = (math.max(1, (m.width * scale).toInt), math.max(1, (m.height * scale).toInt))
    val keepRatio = (w.toLong * h) / math.max(1.0, m.width.toLong * m.height)
    val src = if (row.media == null) Array.emptyByteArray else row.media
    val stride = math.max(1, (1.0 / math.max(keepRatio, 1e-9)).toInt)
    val out = new Array[Byte]((src.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = src(i * stride); i += 1 }
    MediaRow(row.id, out, m.copy(bytes = out.length.toLong, width = w, height = h))
  }

  /** Batched per-partition resize — same mapPartitions batch shape as
    * [[extractFeatures]]; real decoders amortize setup per batch. */
  def resize(ds: Dataset[MediaRow], maxW: Int, maxH: Int, batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder init, buffer reuse)
        batch.iterator.map(resizeStub(_, maxW, maxH))
      }
    }
  }

  /** Attach a typed metadata struct to a raw (id, binary) DataFrame using
    * only deterministic byte-level columns (length) + the stub probe. */
  def withMeta(df: DataFrame, idCol: String, mediaCol: String, kind: String)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => MediaRow(id, bytes, decodeStub(kind, bytes)) }
  }
}
