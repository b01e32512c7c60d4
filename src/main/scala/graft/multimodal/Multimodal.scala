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
  * tested on generated fixtures in MultimodalSpec); `audio/...` payloads
  * run the REAL JDK PCM codec (`javax.sound.sampled` — WAV/AIFF/AU, also
  * fixture-tested); `video/...` payloads run the REAL [[AviCodec]] parser
  * (uncompressed AVI and MJPEG — the two formats decodable without native
  * codecs; other codecs degrade to the all-zero row). Other mimes fall to a
  * DETERMINISTIC STUB: `fakeDecode` derives dimensions/frames/signal from
  * the payload length alone, by formulas an external oracle can replicate.
  * The Spark-side plumbing — schema, encoders, batching, partitioning,
  * UDF signature — is identical for all paths.
  */
object Multimodal {

  /** ImageIO defaults to a FILE-backed stream cache — every read/write
    * spills through a temp file (measured 2-3x the whole decode cost on
    * in-memory payloads). These wrappers pin a MEMORY-cache stream PER
    * CALL instead of flipping the process-global `ImageIO.setUseCache`
    * flag, which would leak into any application embedding this library
    * (their multi-hundred-MB file reads may need the disk cache). */
  private[multimodal] def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself on SUCCESS
    // (a finally-close would double-close, throw, and the NonFatal
    // degrade path would zero every image) — but on a null return ("no
    // reader claims this") the stream is left OPEN, and that is exactly
    // the corrupt-blob degrade path: close it ourselves only then
    val img = javax.imageio.ImageIO.read(in)
    if (img == null) in.close()
    img
  }

  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      try { w.setOutput(out); w.write(img) } finally w.dispose()
      out.flush()
    } finally out.close()
    bos.toByteArray
  }

  /** JPEG encode at an explicit quality (same memory-cache-stream shape as
    * [[writePng]]). Quality 1.0f makes the quantization tables all-ones, so
    * a SOLID-COLOR frame round-trips bit-exactly (all AC coefficients are
    * zero and the DC term is unquantized) — the property [[AviCodec]]'s
    * MJPEG fixtures and their formula oracles rely on; verified for all 256
    * gray levels in MultimodalSpec. */
  private[multimodal] def writeJpeg(
      img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      try {
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        w.setOutput(out)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally w.dispose()
      out.flush()
    } finally out.close()
    bos.toByteArray
  }

  /** Encode packed 0xRRGGBB pixels via the named ImageIO writer
    * ("png" / "gif" / "bmp" / "tiff"; "jpeg" routes through [[writeJpeg]] at
    * quality 1) — the fixture face for header-sniff and decode tests. */
  private[graft] def encodeImage(
      format: String, width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height, "encodeImage: width*height pixels")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    if (format == "jpeg") writeJpeg(img, 1.0f)
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        val w = javax.imageio.ImageIO.getImageWritersByFormatName(format).next()
        try { w.setOutput(out); w.write(img) } finally w.dispose()
        out.flush()
      } finally out.close()
      bos.toByteArray
    }
  }

  /** Header-only media metadata ([[MediaSniff]] as the codegen'd
    * [[graft.functions.SniffMedia]] expression): format + dimensions /
    * PCM layout / frame count straight from magic bytes, NO decode. The
    * 100 TB stats pass: runs at scan speed inside whole-stage codegen,
    * never materializes pixels/samples, and the payload column never
    * leaves the scan — only the small struct flows on. Unrecognized
    * payloads yield all-null fields (format included). */
  def sniffMedia(media: DataFrame): DataFrame = {
    val s = graft.functions.MediaExpressionFunctions.mediaSniff(col("content"))
    // two-step projection: the aliased struct is evaluated ONCE and the
    // field split reads from it. CollapseProject declines to inline a
    // non-cheap expression referenced more than once, so this holds even
    // when whole-stage codegen (whose subexpression elimination would
    // also dedup the 7-way split) is unavailable.
    media.select(col("media_id"), s.as("__sniff"))
      .select("media_id", "__sniff.*")
  }

  /** One resampled clip from [[audioResample]]. */
  final case class ResampledAudio(
      media_id: Long, src_rate: Int, dst_rate: Int, n_src: Int, n_out: Int,
      sum_out: Long, content: Array[Byte])

  /** Audio rate conversion — the 16 kHz standardization pass every
    * speech-model pipeline runs before featurization: channel 0 of each
    * plain-PCM WAV payload is LINEARLY interpolated onto the target
    * rate's sample grid (`x_j = j·src/dst`; the last source sample holds
    * beyond the final interval) and re-encoded as a mono 16-bit WAV.
    * Values are computed in double as `s0 + (s1 − s0)·frac` in exactly
    * that order, then `floor(v + 0.5)` (not round — half-away rules
    * differ across engines) and clamped to int16 — every step an
    * external oracle replicates bit-for-bit on synthetic ramps.
    * `sum_out` (the sum of emitted samples) rides along as the cheap
    * checksum the oracle checks without carrying audio binary. Non-WAV
    * and non-16-bit payloads contribute no rows; batched
    * `mapPartitions` via the lock-free [[WavCodec]], shuffle-free. */
  def audioResample(media: DataFrame, dstRate: Int)(
      implicit spark: SparkSession): Dataset[ResampledAudio] = {
    require(dstRate >= 1, "audioResample: dstRate must be >= 1")
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { m =>
        WavCodec.parse(m.content) match {
          case Some(w) if w.bitsPerSample == 16 && w.rate >= 1 && w.nFrames >= 1 =>
            val n = w.nFrames
            val nOut = (((n - 1).toLong * dstRate) / w.rate).toInt + 1
            val outS = new Array[Short](nOut)
            var sum = 0L
            var j = 0
            while (j < nOut) {
              val x = j.toDouble * w.rate / dstRate
              val i0 = x.toInt
              val v =
                if (i0 >= n - 1) w.sample16(n - 1, 0).toDouble
                else {
                  val s0 = w.sample16(i0, 0).toDouble
                  s0 + (w.sample16(i0 + 1, 0).toDouble - s0) * (x - i0)
                }
              val r = math.max(-32768.0, math.min(32767.0, math.floor(v + 0.5))).toInt
              outS(j) = r.toShort
              sum += r
              j += 1
            }
            Some(ResampledAudio(m.media_id, w.rate, dstRate, n, nOut, sum,
              WavCodec.encodePcm16(dstRate, 1, outS)))
          case _ => None
        }
      })
    }(Encoders.product[ResampledAudio])
  }

  /** One ViT-style patch from [[patchify]]. */
  final case class ImagePatch(
      media_id: Long, px: Int, py: Int, patch: Int, mean_lum: Double)

  /** Patch extraction — the ViT preprocessing shape: each decoded image
    * is cut into a non-overlapping `patch`×`patch` grid (partial edge
    * blocks DROPPED, the standard convention) and one row per patch
    * carries its grid position and mean sRGB luminance in [0, 1] — the
    * per-patch statistic downstream filters sort/threshold on without
    * touching pixels. Per-pixel luminance is `(r+g+b)/3.0` and the
    * block mean divides by `patch²` then 255 — fixed order, so gray
    * fixtures (integer-exact sums) reproduce externally bit-for-bit.
    * Undecodable payloads and images smaller than one patch contribute
    * no rows; batched `mapPartitions`, shuffle-free. */
  def patchify(media: DataFrame, patch: Int)(
      implicit spark: SparkSession): Dataset[ImagePatch] = {
    require(patch >= 1, "patchify: patch must be >= 1")
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { m =>
        val img =
          if (m.mime != null && m.mime.startsWith("image/"))
            try readImage(m.content)
            catch { case scala.util.control.NonFatal(_) => null }
          else null
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth
          val h = img.getHeight
          for {
            py <- (0 until h / patch).iterator
            px <- (0 until w / patch).iterator
          } yield {
            var lum = 0.0
            var dy = 0
            while (dy < patch) {
              var dx = 0
              while (dx < patch) {
                val rgb = img.getRGB(px * patch + dx, py * patch + dy)
                lum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                dx += 1
              }
              dy += 1
            }
            ImagePatch(m.media_id, px, py, patch,
              lum / (patch * patch) / 255.0)
          }
        }
      })
    }(Encoders.product[ImagePatch])
  }

  final case class AudioSegment(
      media_id: Long, seg_idx: Int, start_frame: Long, end_frame: Long)

  /** Energy-based speech/activity segmentation — the silence-trimming
    * pass of audio data prep (drop the dead air, keep the utterances):
    * channel 0 is cut into `frameLen`-sample frames (trailing partial
    * frame dropped), a frame is ACTIVE when its sum of squared samples
    * exceeds `threshold` (16-bit sample units²; integer arithmetic, so
    * activity is exact and engine-reproducible), and maximal runs of
    * active frames become segments `[start_frame, end_frame)` indexed in
    * order. Non-PCM/undecodable payloads contribute no rows; a fully
    * silent clip yields none. Batched `mapPartitions`, shuffle-free —
    * the [[audioResample]] shape. */
  def energySegments(media: DataFrame, frameLen: Int, threshold: Long)(
      implicit spark: SparkSession): Dataset[AudioSegment] = {
    require(frameLen >= 1 && threshold >= 0, "energySegments: frameLen >= 1, threshold >= 0")
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { m =>
        WavCodec.parse(m.content) match {
          case Some(w) if w.bitsPerSample == 16 && w.nFrames >= frameLen =>
            val nF = w.nFrames / frameLen
            val segs = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
            var segStart = -1L
            var f = 0
            while (f < nF) {
              var e = 0L
              var i = 0
              while (i < frameLen) {
                val s = w.sample16(f * frameLen + i, 0).toLong
                e += s * s
                i += 1
              }
              val active = e > threshold
              if (active && segStart < 0) segStart = f
              if (!active && segStart >= 0) {
                segs += AudioSegment(m.media_id, segs.size, segStart, f)
                segStart = -1L
              }
              f += 1
            }
            if (segStart >= 0) segs += AudioSegment(m.media_id, segs.size, segStart, nF)
            segs.iterator
          case _ => Iterator.empty
        }
      })
    }(Encoders.product[AudioSegment])
  }

  final case class ChannelStats(
      media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double,
      std_r: Double, std_g: Double, std_b: Double)

  /** Per-image channel statistics — the normalization-constants pass of
    * vision training (per-channel mean/std in [0, 1] feeding the input
    * transform). Pixel sums and sums of squares accumulate as exact
    * integers (sumsq ≤ 255²·n fits a long below ~10^14 pixels), then
    * one fixed sequence of IEEE ops: mean₂₅₅ = Σ/n, var₂₅₅ =
    * max(Σx²/n − mean₂₅₅², 0), outputs divided by 255 — so constructed
    * fixtures reproduce externally bit-for-bit (the m13 oracle
    * strategy). Undecodable or zero-pixel payloads contribute no rows;
    * batched `mapPartitions`, shuffle-free. */
  def channelStats(media: DataFrame)(
      implicit spark: SparkSession): Dataset[ChannelStats] = {
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { m =>
        val img =
          if (m.mime != null && m.mime.startsWith("image/"))
            try readImage(m.content)
            catch { case scala.util.control.NonFatal(_) => null }
          else null
        if (img == null || img.getWidth == 0 || img.getHeight == 0) Iterator.empty
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var qr = 0L; var qg = 0L; var qb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sr += r; sg += g; sb += b
              qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          def mean255(s: Long): Double = s.toDouble / n.toDouble
          def std01(s: Long, q: Long): Double = {
            val m = mean255(s)
            math.sqrt(math.max(q.toDouble / n.toDouble - m * m, 0.0)) / 255.0
          }
          Iterator.single(ChannelStats(m.media_id, w, h,
            mean255(sr) / 255.0, mean255(sg) / 255.0, mean255(sb) / 255.0,
            std01(sr, qr), std01(sg, qg), std01(sb, qb)))
        }
      })
    }(Encoders.product[ChannelStats])
  }

  /** One archive member from [[expandZipShards]]. */
  final case class ArchiveMember(
      shard_id: Long, member_idx: Int, member_name: String,
      byte_len: Long, content: Array[Byte])

  /** Archive-shard expansion — the webdataset ingestion shape: training
    * samples shipped as archive bundles (each member one file of a
    * sample: image, caption, metadata), expanded to one row per member
    * for the decode/sniff/curation operators downstream. Pure-JVM
    * `java.util.zip` streaming read, batched `mapPartitions`, shuffle-
    * free; 0-based `member_idx` is the member's position among the
    * archive's FILE entries (directories don't count), so it stays a
    * stable pairing key for webdataset-style (shard, idx) sample
    * assembly even when a sibling member is skipped — a skipped member
    * leaves a GAP, it does not renumber the rest. Degrade contract: a
    * corrupt archive keeps the members already read and stops (never
    * throws); a member inflating past `maxMemberBytes` is SKIPPED whole
    * (truncating silently would feed corrupt samples downstream); and
    * the shard stops expanding once `maxShardBytes` of inflated data
    * have been kept — the classic zip bomb is MANY small members, so a
    * per-member cap alone still OOMs the executor. */
  def expandZipShards(
      shards: DataFrame, maxMemberBytes: Int = 1 << 26,
      maxShardBytes: Long = 1L << 28)(
      implicit spark: SparkSession): Dataset[ArchiveMember] = {
    require(maxMemberBytes >= 1, "expandZipShards: maxMemberBytes must be >= 1")
    require(maxShardBytes >= 1, "expandZipShards: maxShardBytes must be >= 1")
    import spark.implicits._
    // clamp before +1: maxMemberBytes = Int.MaxValue must mean "no
    // per-member cap", not an Int overflow that empties every shard
    val probe = math.min(maxMemberBytes, Int.MaxValue - 1) + 1
    shards.select(col("shard_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sid, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[ArchiveMember]
        if (bytes != null) {
          try {
            val zin = new java.util.zip.ZipInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              var e = zin.getNextEntry
              var idx = 0
              var total = 0L
              while (e != null && total < maxShardBytes) {
                if (!e.isDirectory) {
                  val buf = zin.readNBytes(probe)
                  if (buf.length <= maxMemberBytes) {
                    out += ArchiveMember(sid, idx, e.getName, buf.length.toLong, buf)
                    total += buf.length
                  }
                  idx += 1 // archive position: skipped members leave a gap
                }
                e = zin.getNextEntry
              }
            } finally zin.close()
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        out
      })
  }

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
    // NonFatal, not just IOException: ImageIO plugins throw runtime
    // exceptions (IllegalArgument, CMM, index bounds...) on malformed
    // payloads, and a corrupt blob must degrade to metadata, not kill
    // the job
    val img =
      try readImage(m.content)
      catch { case scala.util.control.NonFatal(_) => null }
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

  /** Real JVM-native audio decode for `audio/...` payloads via
    * `javax.sound.sampled` (WAV/AIFF/AU PCM — the codecs the JDK ships;
    * pure JVM, deterministic). Field mapping into the shared
    * [[DecodedMedia]] schema, documented here once:
    *   width    = sample rate (Hz)
    *   height   = channel count
    *   n_frames = audio frame count (clamped to Int.MaxValue)
    *   mean_px  = mean |amplitude| over all samples, normalized to [0, 1]
    *              (16-bit signed and 8-bit unsigned PCM; other encodings
    *              decode format metadata with mean 0.0)
    * Undecodable payloads degrade to the all-zero row, same convention
    * as [[imageDecode]]. */
  private def audioDecode(m: MediaRecord): DecodedMedia = {
    val len = m.content.length.toLong
    val digest = MessageDigest.getInstance("MD5")
    val hash = digest.digest(m.content).map("%02x".format(_)).mkString
    // FAST PATH: plain-PCM WAV through the lock-free [[WavCodec]] —
    // identical field values to the AudioSystem path below (same frame
    // count, same |amplitude| normalization over ALL channels' samples),
    // without the provider-registry contention that serializes a
    // many-core executor (measured; see WavCodec). AIFF/AU/compressed
    // fall through to AudioSystem.
    WavCodec.parse(m.content) match {
      case Some(w) if w.bitsPerSample == 16 =>
        var sum = 0.0
        var n = 0L
        var o = w.dataOff
        // complete 2-byte samples only — same bound as the AudioSystem
        // path's `i + 1 < pcm.length` over the data bytes
        while (o + 1 < w.dataOff + w.dataLen) {
          val s = (((w.bytes(o + 1) & 0xff) << 8) | (w.bytes(o) & 0xff)).toShort
          sum += math.abs(s.toDouble) / 32768.0
          n += 1
          o += 2
        }
        return DecodedMedia(m.media_id, len, hash, w.rate, w.channels, w.nFrames,
          if (n == 0) 0.0 else sum / n)
      case Some(w) if w.bitsPerSample == 8 =>
        var sum = 0.0
        var n = 0L
        var o = w.dataOff
        while (o < w.dataOff + w.dataLen) {
          sum += math.abs((w.bytes(o) & 0xff) - 128).toDouble / 128.0
          n += 1
          o += 1
        }
        return DecodedMedia(m.media_id, len, hash, w.rate, w.channels, w.nFrames,
          if (n == 0) 0.0 else sum / n)
      case _ => // not plain PCM WAV: AudioSystem fallback below
    }
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) DecodedMedia(m.media_id, len, hash, 0, 0, 0, 0.0)
    else
      try {
        val fmt = ais.getFormat
        val frames = math.min(math.max(ais.getFrameLength, 0L), Int.MaxValue.toLong).toInt
        val pcm = ais.readAllBytes()
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        var sum = 0.0
        var n = 0L
        if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) {
          var i = 0
          while (i + 1 < pcm.length) {
            val s =
              if (fmt.isBigEndian) ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
              else ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
            sum += math.abs(s.toDouble) / 32768.0
            n += 1
            i += 2
          }
        } else if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8) {
          var i = 0
          while (i < pcm.length) {
            sum += math.abs((pcm(i) & 0xff) - 128).toDouble / 128.0
            n += 1
            i += 1
          }
        }
        DecodedMedia(m.media_id, len, hash,
          math.round(fmt.getSampleRate).toInt, fmt.getChannels, frames,
          if (n == 0) 0.0 else sum / n)
      } catch {
        case scala.util.control.NonFatal(_) =>
          DecodedMedia(m.media_id, len, hash, 0, 0, 0, 0.0)
      } finally ais.close()
  }

  /** Real decode for `video/...` payloads via [[AviCodec]] — uncompressed
    * AVI (RIFF, BI_RGB 24-bit DIB frames) and MJPEG (one JPEG stream per
    * frame chunk, decoded by the JDK's own ImageIO reader), the two video
    * formats a JVM with no native codecs can honestly parse. Field
    * mapping: width/height from the main header, n_frames counted from
    * movi chunks, mean_px = mean sRGB luminance over all frames' pixels /
    * 255. Other codecs (DV, cinepak, H.26x...) and non-AVI containers
    * degrade to the all-zero row (same convention as [[imageDecode]]) —
    * THAT residue, not a formula stub, is the remaining limit of the
    * video path. */
  private def videoDecode(m: MediaRecord): DecodedMedia = {
    val len = m.content.length.toLong
    val digest = MessageDigest.getInstance("MD5")
    val hash = digest.digest(m.content).map("%02x".format(_)).mkString
    AviCodec.decode(m.content) match {
      case Some(v) =>
        DecodedMedia(m.media_id, len, hash, v.width, v.height, v.nFrames, v.meanLuminance)
      case None => DecodedMedia(m.media_id, len, hash, 0, 0, 0, 0.0)
    }
  }

  /** 16-bit signed little-endian PCM WAV encoder — a standard WAV any
    * reader (including `javax.sound.sampled`, spec-asserted) accepts;
    * PCM is lossless, so [[decode]]/[[audioSpectral]] read back exactly
    * what went in. Multi-channel input is frame-interleaved:
    * `samples(frame * channels + ch)`. The write face of the audio path
    * and the fixture generator for environments that ship no media (the
    * audio analog of [[AviCodec.encode]]). Delegates to the lock-free
    * [[WavCodec]] — the `AudioSystem` writer's global provider registry
    * measurably CONTENDS across executor threads (see [[WavCodec]]). */
  def encodeWavPcm16(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] =
    WavCodec.encodePcm16(rate, channels, samples)

  /** Per-clip spectral features from a real FFT ([[Fft]]) over the decoded
    * PCM stream — the audio analog of the image luminance features.
    *
    * Analysis window: the first `highestOneBit(min(n_samples, 4096))`
    * samples of CHANNEL 0, i.e. the longest power-of-two prefix the FFT
    * accepts, capped at 4096 (~0.1-1 s of context at speech/music rates —
    * a clip-level fingerprint, not a spectrogram). Raw 16-bit sample
    * values feed the FFT unnormalized; every emitted feature is a RATIO,
    * so the scale cancels.
    *
    * Features over bins k = 0..n/2 (DC through Nyquist), f_k = k·rate/n:
    *   - spectral_centroid = Σ f_k·|X_k| / Σ |X_k|  (Hz; 0 for silence)
    *   - e_band0..3 = fraction of Σ|X_k|² in 4 equal bands of [0, Nyquist]
    *     (band of bin k = clamp(⌊k·4/(n/2)⌋), so DC → band 0, the
    *     exact-quarter bin n/4 → band 2)
    *
    * A clip that fails to decode (or is shorter than 2 samples) degrades
    * to the all-zero row, same convention as [[decode]]. Shuffle-free:
    * one batched `mapPartitions`, same shape as the decode stage. */
  final case class AudioSpectral(
      media_id: Long, sample_rate: Int, n_window: Int, spectral_centroid: Double,
      e_band0: Double, e_band1: Double, e_band2: Double, e_band3: Double)

  def audioSpectral(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioSpectral] = {
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map(spectralOf))
    }(Encoders.product[AudioSpectral])
  }

  private def spectralOf(m: MediaRecord): AudioSpectral = {
    val zero = AudioSpectral(m.media_id, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // FAST PATH: plain 16-bit PCM WAV via the lock-free [[WavCodec]]
    // (the AudioSystem provider registry contends across threads — see
    // WavCodec); other containers/encodings fall through to AudioSystem.
    WavCodec.parse(m.content) match {
      case Some(w) if w.bitsPerSample == 16 =>
        val nWin = Integer.highestOneBit(math.min(w.nFrames, 4096))
        if (nWin < 2) return zero
        val window = new Array[Double](nWin)
        var i = 0
        while (i < nWin) { window(i) = w.sample16(i, 0).toDouble; i += 1 }
        return spectralFeatures(m.media_id, w.rate, nWin, window)
      case _ =>
    }
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) zero
    else
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) zero
        else {
          val rate = math.round(fmt.getSampleRate)
          val channels = fmt.getChannels
          val pcm = ais.readAllBytes()
          val frameBytes = 2 * channels
          val nFrames = pcm.length / frameBytes
          val nWin = Integer.highestOneBit(math.min(nFrames, 4096))
          if (nWin < 2) zero
          else {
            val window = new Array[Double](nWin)
            var i = 0
            while (i < nWin) {
              val o = i * frameBytes // channel 0 of frame i
              val s =
                if (fmt.isBigEndian) ((pcm(o) << 8) | (pcm(o + 1) & 0xff)).toShort
                else ((pcm(o + 1) << 8) | (pcm(o) & 0xff)).toShort
              window(i) = s.toDouble
              i += 1
            }
            spectralFeatures(m.media_id, rate, nWin, window)
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => zero
      } finally ais.close()
  }

  /** Shared feature computation for both [[spectralOf]] paths — see
    * [[audioSpectral]] for the feature definitions. */
  private def spectralFeatures(
      mediaId: Long, rate: Int, nWin: Int, window: Array[Double]): AudioSpectral = {
    val mag = Fft.magnitudes(window)
    var wsum = 0.0
    var fsum = 0.0
    val energy = new Array[Double](4)
    var k = 0
    while (k < mag.length) {
      wsum += mag(k)
      fsum += mag(k) * k * rate.toDouble / nWin
      val band = math.min(3, k * 4 / (nWin / 2))
      energy(band) += mag(k) * mag(k)
      k += 1
    }
    val total = energy.sum
    def frac(b: Int): Double = if (total == 0.0) 0.0 else energy(b) / total
    AudioSpectral(mediaId, rate, nWin,
      if (wsum == 0.0) 0.0 else fsum / wsum,
      frac(0), frac(1), frac(2), frac(3))
  }

  /** One extracted video frame: real pixels as a lossless PNG payload +
    * the metadata/luminance columns an oracle can check (the payload
    * itself is spec-verified by exact pixel round-trip — binary columns
    * don't hash-compare). */
  final case class ExtractedFrame(
      media_id: Long, frame_idx: Int, width: Int, height: Int,
      mean_px: Double, frame_png: Array[Byte])

  /** Frame EXTRACTION — the video → vision-training bridge: decode every
    * `stride`-th frame of each `video/...` payload ([[AviCodec.decodeFrames]]:
    * BI_RGB and MJPEG, top-down pixel order) and emit one row per frame
    * with the pixels re-encoded as a lossless PNG payload, ready for the
    * image operators ([[decode]], [[resizeImages]], [[luminanceGrid]]...).
    * Contrast [[sampleFrames]], which emits frame INDEX rows only
    * (payload-free — the cheap path when downstream needs positions, not
    * pixels). Non-video mimes and undecodable payloads contribute no
    * rows. Shuffle-free: one batched `mapPartitions`, same shape as the
    * decode stage — fan the input out first (the m4 lesson) when the
    * source is a single-partition scan. */
  def extractFrames(media: DataFrame, stride: Int)(
      implicit spark: SparkSession): Dataset[ExtractedFrame] = {
    require(stride >= 1, "extractFrames: stride must be >= 1")
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { m =>
        if (m.mime == null || !m.mime.startsWith("video/")) Iterator.empty
        else AviCodec.decodeFrames(m.content, stride).iterator.map { f =>
          val img = new java.awt.image.BufferedImage(
            f.width, f.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, f.width, f.height, f.rgb, 0, f.width)
          var lum = 0.0
          var i = 0
          while (i < f.rgb.length) {
            val p = f.rgb(i)
            lum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0
            i += 1
          }
          ExtractedFrame(m.media_id, f.index, f.width, f.height,
            if (f.rgb.isEmpty) 0.0 else lum / f.rgb.length / 255.0,
            writePng(img))
        }
      })
    }(Encoders.product[ExtractedFrame])
  }

  /** THE STUB for payloads that are none of image/audio/video:
    * deterministic fake decode from payload bytes. A real implementation
    * would replace the body with a codec call; everything around it
    * (batching, encoders, schema) is the production shape and is shared
    * with the REAL image, audio and video paths above. */
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
          else if (m.mime != null && m.mime.startsWith("audio/")) audioDecode(m)
          else if (m.mime != null && m.mime.startsWith("video/")) videoDecode(m)
          else fakeDecode(m))
      }
    }(Encoders.product[DecodedMedia])
  }

  /** 8×8 luminance grid of a media payload, row-major, values in [0, 1] —
    * the input of average-hash ([[perceptualHashPairs]]) and any
    * downstream visual featurization. */
  final case class MediaGrid(media_id: Long, byte_len: Long, gray: Array[Double])

  /** Luminance-grid extraction, same batched `mapPartitions` dispatch as
    * [[decode]]: `image/...` payloads run the REAL `javax.imageio` codec
    * (cell value = mean sRGB luminance of the cell's pixel block / 255;
    * undecodable → all-zero grid, the degenerate-value convention);
    * other mimes take the DETERMINISTIC STUB grid
    * `gray[j] = ((byte_len · (j+1) · 2654435761) mod 256) / 255` — the
    * same formula family as [[fakeDecode]]'s `mean_px`, replicable by an
    * external oracle. (Stub assumes byte_len < ~5·10⁷ so the product
    * stays in signed-64 range — same regime as `fakeDecode`.) */
  def luminanceGrid(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaGrid] = {
    val in = media.select("media_id", "content", "mime").as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          if (m.mime != null && m.mime.startsWith("image/")) imageGrid(m)
          else MediaGrid(m.media_id, m.content.length.toLong,
            Array.tabulate(64)(j =>
              ((m.content.length.toLong * (j + 1) * 2654435761L) % 256).toDouble / 255.0))
        }
      }
    }(Encoders.product[MediaGrid])
  }

  private def imageGrid(m: MediaRecord): MediaGrid = {
    val len = m.content.length.toLong
    // NonFatal for the same reason as imageDecode: malformed payloads
    // must degrade, not abort the task
    val img =
      try readImage(m.content)
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) MediaGrid(m.media_id, len, Array.fill(64)(0.0))
    else {
      val w = img.getWidth
      val h = img.getHeight
      val gray = new Array[Double](64)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val x0 = c * w / 8
          val x1 = math.max(x0 + 1, (c + 1) * w / 8)
          val y0 = r * h / 8
          val y1 = math.max(y0 + 1, (r + 1) * h / 8)
          var sum = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          gray(r * 8 + c) = sum / ((x1 - x0).toLong * (y1 - y0)) / 255.0
          c += 1
        }
        r += 1
      }
      MediaGrid(m.media_id, len, gray)
    }
  }

  /** Perceptual near-duplicate pairs by average hash (aHash — the classic
    * pHash-family baseline): bit j of the 64-bit fingerprint is set iff
    * grid cell j is brighter than the grid mean; two images within
    * `maxHamming` differing bits are near-duplicates (re-encodes, small
    * crops, watermarks). The image-dedup step of a multimodal pipeline.
    *
    * Same scale shape as SimHash text dedup ([[graft.dedup.Dedup
    * .simhashPairs]]): the fingerprint is stored as two 32-bit halves
    * (`hi`, `lo` — avoids 1<<63 sign traps in external engines), split
    * into four 16-bit blocks; by pigeonhole any pair within hamming
    * distance ≤ 3 shares at least one block, so candidates come from an
    * equi-join on (block_idx, block_value) — never all-pairs — and the
    * exact hamming check runs on candidates only. Works on REAL image
    * grids and stub grids identically. */
  def perceptualHashPairs(grids: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "perceptualHashPairs: 4×16-bit blocking is valid for maxHamming in [0, 3]")
    val g = col("gray")
    // mean materialized as a real column: it is a 64-term sum referenced
    // by all 64 bit tests — inlining would square the expression tree
    val mean = (1 to 64).map(j => element_at(g, j)).reduce(_ + _) / lit(64.0)
    def pack(lo: Int, hi: Int): org.apache.spark.sql.Column =
      (lo to hi).map(j =>
        when(element_at(g, j) > col("__mean"), lit(1L << (j - lo))).otherwise(lit(0L)))
        .reduce(_ + _)
    // hash 0 ⟺ no cell brighter than the mean ⟺ a CONSTANT grid: every
    // undecodable payload (all-zero grid) and every solid-color image.
    // aHash cannot distinguish these from each other — keeping them
    // would pair all of them pairwise (a false-positive N² blowup and
    // an N-hot blocking key), so degenerate grids are excluded; route
    // corrupt payloads through content_hash dedup instead. The filter
    // sits ABOVE the persisted relation: below it, predicate pushdown
    // would substitute both 64-term pack expressions into the Filter,
    // doubling the hash computation per row and blowing the generated
    // method out of whole-stage codegen (measured 1.9 s → 8.2 s).
    val hashes = grids
      .withColumn("__mean", mean)
      .select(col("media_id"), pack(1, 32).as("hi"), pack(33, 64).as("lo"))
      .transform(graft.CacheRegistry.persisted(_)) // all four block branches and both join sides read this
      .where(col("hi") =!= 0L || col("lo") =!= 0L)
    val blk = Seq(
      (0, col("hi").bitwiseAND(lit(65535L))),
      (1, shiftright(col("hi"), 16).bitwiseAND(lit(65535L))),
      (2, col("lo").bitwiseAND(lit(65535L))),
      (3, shiftright(col("lo"), 16).bitwiseAND(lit(65535L))))
      .map { case (i, bv) =>
        hashes.select(col("media_id"), col("hi"), col("lo"),
          lit(i).as("bi"), bv.as("bv"))
      }
      .reduce(_ unionAll _)
    val a = blk.select(col("bi"), col("bv"), col("media_id").as("id_a"),
      col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = blk.select(col("bi"), col("bv"), col("media_id").as("id_b"),
      col("hi").as("hi_b"), col("lo").as("lo_b"))
    a.join(b, Seq("bi", "bv"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
      .distinct()
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long"))
      .where(col("hamming") <= maxHamming)
  }

  /** Aspect-preserving fit of (w, h) into maxSide×maxSide: the longer side
    * becomes maxSide, never upscaled; either dim rounds but never below 1. */
  def fitDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val longSide = math.max(w, h)
    val scale = if (longSide <= maxSide) 1.0 else maxSide.toDouble / longSide
    (math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt))
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
        // pixel path: [[resizeImages]]; this face is metadata-only for
        // payloads with no JVM codec (the video stub)
        batch.map { m =>
          if (m.width <= 0 || m.height <= 0)
            // failed decode (0×0): propagate the degenerate row rather
            // than fabricating a 1×1 image with Infinity scale factors
            ResizedMedia(m.media_id, 0, 0, m.width, m.height, 1.0, 1.0)
          else {
            val (w, h) = fitDims(m.width, m.height, maxSide)
            ResizedMedia(m.media_id, w, h, m.width, m.height,
              w.toDouble / m.width, h.toDouble / m.height)
          }
        }
      }
    }(Encoders.product[ResizedMedia])
  }

  /** Fractional-area box filter ("area averaging", OpenCV INTER_AREA): each
    * output pixel is the coverage-weighted mean of the source box it maps
    * onto — the correct antialiasing filter for DOWNSCALING (bilinear
    * undersamples when the scale factor exceeds 2). When the scale factor
    * is integral the box is exact k×k blocks, so output pixels are exact
    * block means — which is what the spec fixtures pin. Pure JVM
    * (`java.awt.image`, headless-safe), deterministic, per-channel sRGB. */
  private[graft] def areaResample(
      img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val sw = img.getWidth
    val sh = img.getHeight
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sx = sw.toDouble / w
    val sy = sh.toDouble / h
    var oy = 0
    while (oy < h) {
      val y0 = oy * sy
      val y1 = (oy + 1) * sy
      val yEnd = math.min(math.ceil(y1).toInt, sh)
      var ox = 0
      while (ox < w) {
        val x0 = ox * sx
        val x1 = (ox + 1) * sx
        val xEnd = math.min(math.ceil(x1).toInt, sw)
        var r = 0.0; var g = 0.0; var b = 0.0; var area = 0.0
        var yy = y0.toInt
        while (yy < yEnd) {
          val fy = math.min(y1, yy + 1.0) - math.max(y0, yy.toDouble)
          var xx = x0.toInt
          while (xx < xEnd) {
            val fx = math.min(x1, xx + 1.0) - math.max(x0, xx.toDouble)
            val rgb = img.getRGB(xx, yy)
            val f = fx * fy
            r += ((rgb >> 16) & 0xff) * f
            g += ((rgb >> 8) & 0xff) * f
            b += (rgb & 0xff) * f
            area += f
            xx += 1
          }
          yy += 1
        }
        out.setRGB(ox, oy,
          (math.round(r / area).toInt << 16) |
            (math.round(g / area).toInt << 8) |
            math.round(b / area).toInt)
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Real-pixel resize row: aspect-fit dims, mean luminance of the RESIZED
    * pixels, and the re-encoded PNG payload. */
  final case class ResizedImage(
      media_id: Long, src_width: Int, src_height: Int,
      width: Int, height: Int, mean_px: Double, content: Array[Byte])

  /** REAL pixel resize for `image/...` payloads: decode (`javax.imageio`),
    * aspect-fit into maxSide×maxSide ([[fitDims]] — never upscales),
    * [[areaResample]], PNG re-encode. Same batched `mapPartitions` shape as
    * [[decode]]; non-image or undecodable payloads degrade to the all-zero
    * row with an empty payload (the degenerate-value convention). mean_px =
    * mean sRGB luminance of the OUTPUT pixels / 255 — for a solid input
    * this equals the input level exactly (a box average of a constant is
    * the constant), which is what gives the m4 query an exact SQL oracle. */
  def resizeImages(media: DataFrame, maxSide: Int)(
      implicit spark: SparkSession): Dataset[ResizedImage] = {
    require(maxSide >= 1, "resizeImages: maxSide must be >= 1")
    val in = media.select("media_id", "content", "mime")
      .as(Encoders.product[MediaRecord])
    in.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          val img =
            if (m.mime != null && m.mime.startsWith("image/"))
              try readImage(m.content)
              catch { case scala.util.control.NonFatal(_) => null }
            else null
          if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
            ResizedImage(m.media_id, 0, 0, 0, 0, 0.0, Array.emptyByteArray)
          else {
            val (w, h) = fitDims(img.getWidth, img.getHeight, maxSide)
            val res =
              if (w == img.getWidth && h == img.getHeight) img
              else areaResample(img, w, h)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = res.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                x += 1
              }
              y += 1
            }
            ResizedImage(m.media_id, img.getWidth, img.getHeight, w, h,
              sum / (w.toLong * h) / 255.0, writePng(res))
          }
        }
      }
    }(Encoders.product[ResizedImage])
  }

  /** Deterministic solid-gray PNG payload — the fixture-payload generator
    * for environments that ship no real media (this container). Production
    * pipelines feed `binaryFile` payloads through the same operators. */
  def solidPng(gray: Int, w: Int, h: Int): Array[Byte] = {
    require(gray >= 0 && gray <= 255 && w >= 1 && h >= 1,
      "solidPng: gray in [0,255], dims >= 1")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    writePng(img)
  }

  /** Frame sampling: every `stride`-th frame of each decoded media item,
    * one output row per sampled frame — payload-free, so downstream
    * video-frame pipelines shuffle only (media_id, frame_idx). */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF()
      // failed decodes carry n_frames = 0; sequence(0, -1, stride) THROWS,
      // so zero-frame media must emit no rows (degrade, don't abort)
      .where(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Scene-cut detection / keyframe selection over an extracted-frame
    * relation (the [[extractFrames]] output, or any
    * (media_id, frame_idx, mean_px) relation): a cut is a frame whose
    * luminance jumps by at least `threshold` (in [0,1] units) from its
    * predecessor — the classic intensity-delta shot-boundary detector
    * (Zhang, Kankanhalli & Smoliar 1993's pairwise-difference family),
    * the cheap first pass vision-training pipelines use to pick one
    * keyframe per shot instead of near-identical consecutive frames.
    *
    * Emits `delta` (|Δ mean_px|, 0.0 for each video's first frame),
    * `is_cut` (delta ≥ threshold; never the first frame), `scene_id`
    * (0-based running cut count — stable shot labels for grouping) and
    * `is_keyframe` (first frame of each scene: the frame to keep).
    *
    * Scale shape: ONE shuffle on media_id with an in-partition frame sort
    * (the x4/x33 window shape — lag + running sum share one window);
    * videos are independent, so the window never sees more rows than one
    * video's frames. Payload-free: operates on the luminance column only. */
  def sceneCuts(frames: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0, "sceneCuts: threshold must be > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("__prev", lag(col("mean_px"), 1).over(w))
      .withColumn("delta",
        when(col("__prev").isNull, lit(0.0))
          .otherwise(abs(col("mean_px") - col("__prev"))))
      .withColumn("is_cut", col("__prev").isNotNull && col("delta") >= threshold)
      .withColumn("scene_id",
        sum(when(col("is_cut"), 1L).otherwise(0L)).over(w))
      .withColumn("is_keyframe", col("__prev").isNull || col("is_cut"))
      .drop("__prev")
  }
}
