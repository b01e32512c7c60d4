package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * plumbing (driver extension surface).
  *
  * Design for 100 TB: the binary payload is carried in ONE column and
  * never shuffled — metadata extraction is a narrow projection; decode is
  * `mapPartitions` over batches so a real decoder would amortize model /
  * codec initialization per partition, not per row; frame sampling emits
  * (media_id, frame_idx) rows via `explode` so downstream ops never touch
  * the payload. Partitioning: payload tables should be written with small
  * `files.maxPartitionBytes` so a partition of ~100 MB of media fits
  * executor memory during decode.
  *
  * Decode dispatches on the mime tag: `image/...` payloads run a REAL
  * pure-JVM codec (`javax.imageio` — PNG/JPEG/BMP/GIF, deterministic,
  * tested on generated fixtures in MultimodalSpec); other mimes fall to a
  * DETERMINISTIC STUB (this container ships no audio/video codecs):
  * `fakeDecode` derives dimensions/frames/signal from the payload length
  * alone, by formulas an external oracle can replicate. The Spark-side
  * plumbing — schema, encoders, batching, partitioning, UDF signature —
  * is identical for both paths.
  */
object Multimodal {

  /** Raw media row: opaque payload + mime tag. */
  final case class MediaRecord(media_id: Long, content: Array[Byte], mime: String)

  /** Decoded media features. A real decoder fills these from the codec;
    * the stub derives them deterministically from the payload. */
  final case class DecodedMedia(
      media_id: Long, byte_len: Long, content_hash: String,
      width: Int, height: Int, n_frames: Int, mean_px: Double)

  /** Batch size for the decode stage — a real decoder would hand each
    * batch to a vectorized codec / model runtime in one call. */
  val decodeBatchSize = 32

  /** Ingest: text column → opaque binary payload + typed metadata struct.
    * (Test corpus has no real media; UTF-8 bytes of `textCol` stand in as
    * the payload. With real data this is `spark.read.format("binaryFile")`
    * or a parquet binary column — same downstream shape.) */
  def ingestFromText(df: DataFrame, idCol: String, textCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit(mime).as("mime"))
      .withColumn("meta", struct(
        length(col("content")).cast("long").as("byte_len"),
        md5(col("content")).as("content_hash"),
        col("mime").as("mime")))

  /** Real JVM-native image decode for `image/...` payloads via
    * `javax.imageio` (PNG/JPEG/BMP/GIF — pure JVM, deterministic, no
    * native codecs required): real width/height, n_frames = 1 (stills),
    * mean_px = mean sRGB luminance over all pixels in row-major order /
    * 255. A payload that fails to decode yields the all-zero metadata row
    * (the media-pipeline analog of the cell-error convention: the value
    * is degenerate and the content hash still identifies the bad blob). */
  private def imageDecode(m: MediaRecord): DecodedMedia = {
    val len = m.content.length.toLong
    val digest = MessageDigest.getInstance("MD5")
    val hash = digest.digest(m.content).map("%02x".format(_)).mkString
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
      catch { case _: java.io.IOException => null }
    if (img == null) DecodedMedia(m.media_id, len, hash, 0, 0, 0, 0.0)
    else {
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          x += 1
        }
        y += 1
      }
      val meanPx = sum / (img.getWidth.toLong * img.getHeight) / 255.0
      DecodedMedia(m.media_id, len, hash, img.getWidth, img.getHeight, 1, meanPx)
    }
  }

  /** THE STUB for non-image payloads: deterministic fake decode from
    * payload bytes (this container has no audio/video codecs). A real
    * implementation would replace the body with a codec call; everything
    * around it (batching, encoders, schema) is the production shape and
    * is shared with the REAL image path above. */
  private def fakeDecode(m: MediaRecord): DecodedMedia = {
    val len = m.content.length.toLong
    val digest = MessageDigest.getInstance("MD5")
    val hash = digest.digest(m.content).map("%02x".format(_)).mkString
    DecodedMedia(
      media_id = m.media_id,
      byte_len = len,
      content_hash = hash,
      width = (16 + len % 64).toInt,
      height = (16 + (len * 7) % 64).toInt,
      n_frames = (1 + len % 8).toInt,
      mean_px = ((len * 2654435761L) % 256).toDouble / 255.0)
  }

  /** Decode stage: typed `mapPartitions` over payload batches, dispatched
    * on the mime tag — `image/...` runs the REAL javax.imageio codec, other
    * mimes the deterministic stub. */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // real impl for audio/video: codec.decodeBatch(batch) — amortized
        // per batch
        batch.map(m =>
          if (m.mime != null && m.mime.startsWith("image/")) imageDecode(m)
          else fakeDecode(m))
      }
    }(Encoders.product[DecodedMedia])
  }

  /** Resized media features. `scale_x`/`scale_y` are what a real resampler
    * would apply; the payload itself is untouched by the stub. */
  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int,
      src_width: Int, src_height: Int, scale_x: Double, scale_y: Double)

  /** Resize stage: same batched `mapPartitions` shape as [[decode]] — a
    * real implementation hands each batch to a vectorized resampler; the
    * stub computes target dims + scale factors from the decoded metadata
    * (deterministic, oracle-replicable). Aspect-preserving fit into
    * `maxSide`×`maxSide`: the longer side becomes `maxSide`, never
    * upscaled. */
  def resize(decoded: Dataset[DecodedMedia], maxSide: Int)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    require(maxSide >= 1, "resize: maxSide must be >= 1")
    decoded.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // real impl: resampler.resizeBatch(batch, maxSide)
        batch.map { m =>
          val longSide = math.max(m.width, m.height)
          val scale = if (longSide <= maxSide) 1.0 else maxSide.toDouble / longSide
          val w = math.max(1, math.round(m.width * scale).toInt)
          val h = math.max(1, math.round(m.height * scale).toInt)
          ResizedMedia(m.media_id, w, h, m.width, m.height,
            w.toDouble / m.width, h.toDouble / m.height)
        }
      }
    }(Encoders.product[ResizedMedia])
  }

  /** Frame sampling: every `stride`-th frame of each decoded media item,
    * one output row per sampled frame — payload-free, so downstream
    * video-frame pipelines shuffle only (media_id, frame_idx). */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF()
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
