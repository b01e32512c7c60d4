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

  private def decodeUnsafe(b: Array[Byte]): Option[AviVideo] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    var width = 0
    var height = 0
    var bitCount = -1
    var compression = -1L
    var nFrames = 0
    var lumSum = 0.0
    var pxCount = 0L
    var lastStrhType = "" // guards strf: audio streams carry WAVEFORMATEX there

    // walk a chunk range [off, end); lists recurse with their type fourcc.
    // inMovi propagates through the standard 'rec ' LISTs interleaved
    // writers nest inside movi (frames there are real frames); any OTHER
    // list type ends the movi scope.
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
          width = u32(b, dataOff + 32).toInt
          height = u32(b, dataOff + 36).toInt
        } else if (id == "strh" && size >= 4) {
          lastStrhType = fourcc(b, dataOff)
        } else if (id == "strf" && size >= 20 && bitCount < 0 &&
          lastStrhType == "vids") {
          // first VIDEO strf wins — an audio stream's strf is a
          // WAVEFORMATEX and must not be read as a BITMAPINFOHEADER
          bitCount = u16(b, dataOff + 14)
          compression = u32(b, dataOff + 16)
        } else if (inMovi && id(0).isDigit && id(1).isDigit &&
          id(2) == 'd' && (id(3) == 'b' || id(3) == 'c')) {
          nFrames += 1
          if (bitCount == 24 && compression == 0L && width > 0 && height > 0) {
            // BI_RGB 24-bit DIB: bottom-up rows, stride padded to 4 bytes
            // (luminance is row-order-invariant, so the bottom-up order
            // needs no flip here)
            val stride = ((width * 3 + 3) / 4) * 4
            if (size >= stride.toLong * height) {
              var y = 0
              while (y < height) {
                val row = dataOff + y * stride
                var x = 0
                while (x < width) {
                  val p = row + x * 3 // B, G, R
                  lumSum += ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3.0
                  x += 1
                }
                y += 1
              }
              pxCount += width.toLong * height
            }
          } else if (compression == MjpgFourcc && size >= 2) {
            // MJPG: the chunk is one complete JPEG stream. A frame the
            // JPEG reader rejects contributes no pixels but still counts
            // (the chunk IS a frame slot) — decode stays total.
            val img =
              try Multimodal.readImage(java.util.Arrays.copyOfRange(b, dataOff, dataEnd))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img != null) {
              val w = img.getWidth
              val h = img.getHeight
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  lumSum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                  x += 1
                }
                y += 1
              }
              pxCount += w.toLong * h
            }
          }
        }
        off = dataEnd + (size.toInt & 1) // chunks are word-aligned
      }
    }

    walk(12, math.min(b.length.toLong, 8L + u32(b, 4)).toInt, inMovi = false)
    val decodable = (bitCount == 24 && compression == 0L) || compression == MjpgFourcc
    if (width <= 0 || height <= 0 || !decodable) None
    else Some(AviVideo(width, height, nFrames,
      if (pxCount == 0L) 0.0 else lumSum / pxCount / 255.0))
  }
}
