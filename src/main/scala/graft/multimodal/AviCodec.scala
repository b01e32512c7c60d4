package graft.multimodal

/** Minimal pure-JVM decoder for AVI video: UNCOMPRESSED (BI_RGB) frames and
  * MJPEG (`biCompression = 'MJPG'`, one JPEG image per frame chunk, decoded
  * by the JDK's own `javax.imageio` JPEG reader) — the two formats a JVM
  * with no native codecs can honestly decode. Scope (checked, not assumed):
  * RIFF `AVI ` file, one video stream, `##db`/`##dc` frame chunks carrying
  * either bottom-up BGR DIB bitmaps with 4-byte row padding (BI_RGB 24-bit)
  * or complete JFIF/JPEG streams (MJPG). Anything else (other codecs, other
  * bit depths) returns None and the caller degrades to the all-zero
  * metadata row — decode never throws on malformed bytes (every read is
  * bounds-checked; the walk gives up rather than guessing; a malformed
  * MJPEG frame contributes no pixels but still counts as a frame).
  *
  * Container layout parsed here (little-endian throughout):
  * {{{
  *   "RIFF" <size> "AVI "
  *     LIST <size> "hdrl"
  *       "avih" <56+>  main header: dwTotalFrames@16, dwWidth@32, dwHeight@36
  *       LIST "strl" -> "strh" (fccType "vids") + "strf" (BITMAPINFOHEADER:
  *                      biBitCount@14 (u16), biCompression@16
  *                      (0 = BI_RGB, 'MJPG' = motion JPEG))
  *     LIST <size> "movi"
  *       "00db"/"00dc" <size> <frame bytes>      (repeated, possibly
  *       LIST "rec " -> frame chunks              grouped in 'rec ' LISTs
  *                                                by interleaved writers)
  * }}}
  */
object AviCodec {

  /** `biCompression` fourcc for motion JPEG: "MJPG" read as a
    * little-endian u32 ('M' is the lowest byte). */
  val MjpgFourcc: Long = 0x47504a4dL

  /** Decoded AVI features: real dimensions, real frame count (counted from
    * movi chunks), mean sRGB luminance over ALL frames' pixels normalized
    * to [0, 1]. */
  final case class AviVideo(width: Int, height: Int, nFrames: Int, meanLuminance: Double)

  /** Encode row-major TOP-DOWN RGB frames (one Array[Int] of packed
    * 0xRRGGBB per frame) as an uncompressed AVI that [[decode]] — or any
    * standard AVI reader — accepts: BI_RGB 24-bit, bottom-up DIB rows
    * padded to 4 bytes. The write-side of the codec; also the fixture
    * generator for environments that ship no media. */
  def encode(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(width >= 1 && height >= 1, "AviCodec.encode: dims must be >= 1")
    require(frames.forall(_.length == width * height),
      "AviCodec.encode: every frame must carry width*height pixels")
    val stride = ((width * 3 + 3) / 4) * 4
    def dib(px: Array[Int]): Array[Byte] = {
      val d = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width // bottom-up
        var x = 0
        while (x < width) {
          val rgb = px(srcRow + x)
          val p = y * stride + x * 3
          d(p) = (rgb & 0xff).toByte
          d(p + 1) = ((rgb >> 8) & 0xff).toByte
          d(p + 2) = ((rgb >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      d
    }
    container(width, height, frames.map(dib), frameId = "00db", biCompression = 0L)
  }

  /** Encode row-major TOP-DOWN RGB frames as a MOTION-JPEG AVI: same
    * container as [[encode]] but `biCompression = 'MJPG'` and each `00dc`
    * chunk holds one complete JPEG stream (JDK ImageIO writer, quality
    * 1.0f — all-ones quantization tables, so solid-color frames round-trip
    * bit-exactly; see [[Multimodal.writeJpeg]]). The fixture generator for
    * the compressed-video decode path. */
  def encodeMjpeg(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(width >= 1 && height >= 1, "AviCodec.encodeMjpeg: dims must be >= 1")
    require(frames.forall(_.length == width * height),
      "AviCodec.encodeMjpeg: every frame must carry width*height pixels")
    def jpeg(px: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      img.setRGB(0, 0, width, height, px, 0, width)
      Multimodal.writeJpeg(img, quality = 1.0f)
    }
    container(width, height, frames.map(jpeg), frameId = "00dc",
      biCompression = MjpgFourcc)
  }

  /** Shared RIFF/AVI container writer: headers + one video stream whose
    * frame chunks are the caller-encoded `frameBytes`. */
  private def container(
      width: Int, height: Int, frameBytes: Seq[Array[Byte]],
      frameId: String, biCompression: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = le32(40000L) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frameBytes.size.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width.toLong) ++ le32(height.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte)
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le16(1) ++ le16(24) ++ le32(biCompression) ++ Array.fill(20)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frameBytes.toArray.flatMap(f => chunk(frameId, f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def decode(bytes: Array[Byte]): Option[AviVideo] =
    try decodeUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Parsed header fields, visible to frame visitors (hdrl precedes movi
    * in the container, so they are set before the first frame arrives). */
  private final class Hdr {
    var width = 0
    var height = 0
    var bitCount = -1
    var compression = -1L
    def decodable: Boolean =
      (bitCount == 24 && compression == 0L) || compression == MjpgFourcc
  }

  /** Shared container walk: parse headers, visit every movi frame chunk
    * as onFrame(hdr, frameIndex, dataOff, dataEnd). Returns the header, or
    * None for a non-AVI. Bounds-checked; gives up on truncation (keeping
    * what was visited) rather than guessing. inMovi propagates through
    * the standard 'rec ' LISTs interleaved writers nest inside movi; any
    * OTHER list type ends the movi scope. */
  private def walkAvi(b: Array[Byte])(
      onFrame: (Hdr, Int, Int, Int) => Unit): Option[Hdr] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    val hdr = new Hdr
    var nFrames = 0
    var lastStrhType = "" // guards strf: audio streams carry WAVEFORMATEX there
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = fourcc(b, off)
        val size = u32(b, off + 4)
        if (size < 0 || off + 8 + size > end) return // truncated: stop, keep what we have
        val dataOff = off + 8
        val dataEnd = (dataOff + size).toInt
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(b, dataOff)
          walk(dataOff + 4, dataEnd,
            inMovi = listType == "movi" || (inMovi && listType == "rec "))
        } else if (id == "avih" && size >= 40) {
          hdr.width = u32(b, dataOff + 32).toInt
          hdr.height = u32(b, dataOff + 36).toInt
        } else if (id == "strh" && size >= 4) {
          lastStrhType = fourcc(b, dataOff)
        } else if (id == "strf" && size >= 20 && hdr.bitCount < 0 &&
          lastStrhType == "vids") {
          // first VIDEO strf wins — an audio stream's strf is a
          // WAVEFORMATEX and must not be read as a BITMAPINFOHEADER
          hdr.bitCount = u16(b, dataOff + 14)
          hdr.compression = u32(b, dataOff + 16)
        } else if (inMovi && id(0).isDigit && id(1).isDigit &&
          id(2) == 'd' && (id(3) == 'b' || id(3) == 'c')) {
          onFrame(hdr, nFrames, dataOff, dataEnd)
          nFrames += 1
        }
        off = dataEnd + (size.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(b.length.toLong, 8L + u32(b, 4)).toInt, inMovi = false)
    Some(hdr)
  }

  /** Decode one MJPG frame chunk via the JDK JPEG reader; null when the
    * reader rejects it (the degrade-not-throw contract). */
  private def mjpgImage(b: Array[Byte], dataOff: Int, dataEnd: Int): java.awt.image.BufferedImage =
    try Multimodal.readImage(java.util.Arrays.copyOfRange(b, dataOff, dataEnd))
    catch { case scala.util.control.NonFatal(_) => null }

  private def decodeUnsafe(b: Array[Byte]): Option[AviVideo] = {
    var nFrames = 0
    var lumSum = 0.0
    var pxCount = 0L
    val hdr = walkAvi(b) { (h, _, dataOff, dataEnd) =>
      nFrames += 1
      val size = dataEnd - dataOff
      if (h.bitCount == 24 && h.compression == 0L && h.width > 0 && h.height > 0) {
        // BI_RGB 24-bit DIB: bottom-up rows, stride padded to 4 bytes
        // (luminance is row-order-invariant, so the bottom-up order
        // needs no flip here)
        val stride = ((h.width * 3 + 3) / 4) * 4
        if (size >= stride.toLong * h.height) {
          var y = 0
          while (y < h.height) {
            val row = dataOff + y * stride
            var x = 0
            while (x < h.width) {
              val p = row + x * 3 // B, G, R
              lumSum += ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          pxCount += h.width.toLong * h.height
        }
      } else if (h.compression == MjpgFourcc && size >= 2) {
        // MJPG: the chunk is one complete JPEG stream. A frame the JPEG
        // reader rejects contributes no pixels but still counts (the
        // chunk IS a frame slot) — decode stays total.
        val img = mjpgImage(b, dataOff, dataEnd)
        if (img != null) {
          val w = img.getWidth
          val ht = img.getHeight
          var y = 0
          while (y < ht) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              lumSum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          pxCount += w.toLong * ht
        }
      }
    }
    hdr match {
      case Some(h) if h.width > 0 && h.height > 0 && h.decodable =>
        Some(AviVideo(h.width, h.height, nFrames,
          if (pxCount == 0L) 0.0 else lumSum / pxCount / 255.0))
      case _ => None
    }
  }

  /** One decoded frame: row-major TOP-DOWN packed 0xRRGGBB pixels (the
    * bottom-up DIB row order is flipped here — unlike the luminance
    * aggregate, pixel extraction is orientation-sensitive). */
  final case class AviFrame(index: Int, width: Int, height: Int, rgb: Array[Int])

  /** Decode every `stride`-th frame (index 0, stride, 2·stride...) of a
    * BI_RGB or MJPEG AVI to pixels — the frame-extraction face behind
    * [[Multimodal.extractFrames]] (video → per-frame images for vision
    * training). Returns the decoded frames; empty for non-AVI bytes,
    * undecodable codecs, or malformed frame chunks (never throws —
    * [[decode]]'s contract). */
  def decodeFrames(bytes: Array[Byte], stride: Int = 1): Seq[AviFrame] = {
    require(stride >= 1, "AviCodec.decodeFrames: stride must be >= 1")
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[AviFrame]
      walkAvi(bytes) { (h, idx, dataOff, dataEnd) =>
        if (idx % stride == 0) {
          val size = dataEnd - dataOff
          if (h.bitCount == 24 && h.compression == 0L && h.width > 0 && h.height > 0) {
            val rowBytes = ((h.width * 3 + 3) / 4) * 4
            if (size >= rowBytes.toLong * h.height) {
              val px = new Array[Int](h.width * h.height)
              var y = 0
              while (y < h.height) {
                val row = dataOff + (h.height - 1 - y) * rowBytes // flip bottom-up
                var x = 0
                while (x < h.width) {
                  val p = row + x * 3 // B, G, R
                  px(y * h.width + x) = ((bytes(p + 2) & 0xff) << 16) |
                    ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
                  x += 1
                }
                y += 1
              }
              out += AviFrame(idx, h.width, h.height, px)
            }
          } else if (h.compression == MjpgFourcc && size >= 2) {
            val img = mjpgImage(bytes, dataOff, dataEnd)
            if (img != null) {
              val w = img.getWidth
              val ht = img.getHeight
              val px = new Array[Int](w * ht)
              img.getRGB(0, 0, w, ht, px, 0, w)
              var i = 0
              while (i < px.length) { px(i) = px(i) & 0xffffff; i += 1 }
              out += AviFrame(idx, w, ht, px)
            }
          }
        }
      }
      out.toSeq
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }
}
