package graft.multimodal

/** Header-only media sniffing: container format + dimensions/layout from
  * magic bytes and fixed header fields, WITHOUT decoding any payload.
  *
  * This is the metadata pass that makes a 100 TB media corpus tractable:
  * a stats/partition/filter stage (count by format, drop tiny images,
  * route video vs audio) should cost O(header bytes) per row, not a full
  * decode — the decode stage ([[Multimodal.decode]]) then runs only on
  * the rows that survive. Every parser here reads a bounded prefix
  * (JPEG/WAV/AVI walk chunk headers and STOP at the first payload chunk)
  * and is bounds-checked throughout: arbitrary bytes never throw, they
  * return [[MediaSniff.unknown]].
  *
  * Formats: PNG (IHDR), JPEG (SOF segment walk), GIF (logical screen
  * descriptor), BMP (BITMAPINFOHEADER), TIFF (IFD0 walk, both byte
  * orders), WAV (fmt + data chunks), AVI (avih header). Sentinel -1 =
  * "field not applicable / not found"; the
  * [[graft.functions.SniffMedia]] expression renders those as null.
  */
object MediaSniff {

  /** Sniffed header fields; -1 marks not-applicable/not-found. */
  final case class Sniffed(
      format: String, width: Int, height: Int, bitDepth: Int,
      channels: Int, sampleRate: Int, nFrames: Int)

  val unknown: Sniffed = Sniffed(null, -1, -1, -1, -1, -1, -1)

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def s32le(b: Array[Byte], o: Int): Int = u32le(b, o).toInt
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Clamp a u32 header field into a sane Int (corrupt headers can carry
    * 4-billion "dimensions"; nothing downstream should trust them as
    * negative Ints). */
  private def dim(v: Long): Int = if (v < 0 || v > Int.MaxValue) -1 else v.toInt

  def sniff(b: Array[Byte]): Sniffed = {
    if (b == null || b.length < 12) return unknown
    val n = b.length
    // PNG: 8-byte signature, then the IHDR chunk is REQUIRED first.
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) {
      if (n >= 25 && fourcc(b, 12) == "IHDR")
        return Sniffed("png", dim(u32be(b, 16)), dim(u32be(b, 20)),
          b(24) & 0xff, -1, -1, -1)
      return Sniffed("png", -1, -1, -1, -1, -1, -1)
    }
    // JPEG: FF D8, then marker segments until a frame header (SOFn) or
    // entropy-coded data (SOS) — header walk only, never the payload.
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      var guard = 0
      while (i + 1 < n && guard < 1024) {
        guard += 1
        if ((b(i) & 0xff) != 0xff) return Sniffed("jpeg", -1, -1, -1, -1, -1, -1)
        var m = b(i + 1) & 0xff
        while (m == 0xff && i + 2 < n) { i += 1; m = b(i + 1) & 0xff } // fill bytes
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // bare markers
        else if (m == 0xd9 || m == 0xda) return Sniffed("jpeg", -1, -1, -1, -1, -1, -1)
        else {
          if (i + 3 >= n) return Sniffed("jpeg", -1, -1, -1, -1, -1, -1)
          val segLen = u16be(b, i + 2)
          if (segLen < 2) return Sniffed("jpeg", -1, -1, -1, -1, -1, -1)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 9 < n && segLen >= 8)
              return Sniffed("jpeg", u16be(b, i + 7), u16be(b, i + 5),
                b(i + 4) & 0xff, b(i + 9) & 0xff, -1, -1)
            return Sniffed("jpeg", -1, -1, -1, -1, -1, -1)
          }
          i += 2 + segLen
        }
      }
      return Sniffed("jpeg", -1, -1, -1, -1, -1, -1)
    }
    // GIF: 6-byte version tag then the logical screen descriptor.
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Sniffed("gif", u16le(b, 6), u16le(b, 8), -1, -1, -1, -1)
    // BMP: BITMAPFILEHEADER then a DIB header; only the common
    // BITMAPINFOHEADER(40)-or-later layouts carry the fields we read.
    // (Truncated files keep the format tag with -1 fields, like every
    // other branch. Height is stored signed — negative means top-down —
    // so its magnitude goes through the same dim() clamp as width:
    // abs(Int.MinValue) stays negative in Int space.)
    // the 2-byte magic alone is noisy on arbitrary bytes; require the
    // BITMAPFILEHEADER reserved words to be zero, as real parsers do
    if (b(0) == 'B' && b(1) == 'M' &&
      b(6) == 0 && b(7) == 0 && b(8) == 0 && b(9) == 0) {
      if (n >= 30 && u32le(b, 14) >= 40)
        return Sniffed("bmp", dim(s32le(b, 18).toLong),
          dim(math.abs(s32le(b, 22).toLong)), u16le(b, 28), -1, -1, -1)
      return Sniffed("bmp", -1, -1, -1, -1, -1, -1)
    }
    // TIFF: II*\0 (little-endian) or MM\0* (big-endian); walk IFD0's
    // fixed-size entries. Inline values are LEFT-JUSTIFIED in the 4-byte
    // value field (a lone SHORT reads at the field start under either
    // endianness); BitsPerSample with count > 1 stores an OFFSET to its
    // shorts instead — followed bounds-checked.
    val tiffLe = b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a && b(3) == 0
    val tiffBe = b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a
    if (tiffLe || tiffBe) {
      def e16(o: Int): Int = if (tiffLe) u16le(b, o) else u16be(b, o)
      def e32(o: Int): Long = if (tiffLe) u32le(b, o) else u32be(b, o)
      var width = -1; var height = -1; var bits = -1; var channels = -1
      val ifd = e32(4)
      if (ifd >= 8 && ifd + 2 <= n) {
        val entries = e16(ifd.toInt)
        var i = 0
        while (i < entries && ifd + 2 + (i + 1) * 12 <= n) {
          val o = ifd.toInt + 2 + i * 12
          val tag = e16(o)
          val typ = e16(o + 2)
          val c = e32(o + 4)
          val scalar: Int =
            if (typ == 3) e16(o + 8)
            else if (typ == 4) dim(e32(o + 8))
            else -1
          if (tag == 256 && c == 1) width = scalar
          else if (tag == 257 && c == 1) height = scalar
          else if (tag == 277 && c == 1) channels = scalar
          else if (tag == 258) {
            // TIFF 6.0 inlines values whenever count × typeSize ≤ 4:
            // one or two SHORTs sit in the value field itself; only
            // three-plus go behind an offset. A nonstandard LONG-typed
            // single value still reads as a scalar; count 0 is
            // malformed and leaves the sentinel.
            if (typ == 3 && (c == 1 || c == 2)) bits = e16(o + 8)
            else if (typ == 3 && c >= 3) {
              val off = e32(o + 8)
              if (off >= 0 && off + 2 <= n) bits = e16(off.toInt)
            } else if (typ == 4 && c == 1) bits = dim(e32(o + 8))
          }
          i += 1
        }
      }
      return Sniffed("tiff", width, height, bits, channels, -1, -1)
    }
    if (fourcc(b, 0) == "RIFF") {
      val riffEnd = math.min(n.toLong, 8L + u32le(b, 4)).toInt
      // WAV: walk top-level chunks for fmt (layout) and data (length).
      if (fourcc(b, 8) == "WAVE") {
        var off = 12
        var channels = -1; var rate = -1; var bits = -1; var frames = -1
        var dataSeen = false
        while (off + 8 <= riffEnd && !(channels >= 0 && dataSeen)) {
          val id = fourcc(b, off)
          val size = u32le(b, off + 4)
          val dataOff = off + 8
          if (id == "fmt " && size >= 16 && dataOff + 16 <= n) {
            channels = u16le(b, dataOff + 2)
            rate = dim(u32le(b, dataOff + 4))
            bits = u16le(b, dataOff + 14)
          } else if (id == "data") {
            dataSeen = true
            if (channels > 0 && bits >= 8)
              frames = dim(size / (channels.toLong * (bits / 8)))
          }
          val step = size + (size & 1)
          if (step < 0 || dataOff.toLong + step > Int.MaxValue) off = riffEnd
          else off = dataOff + step.toInt
        }
        return Sniffed("wav", -1, -1, bits, channels, rate, frames)
      }
      // AVI: find the avih chunk inside LIST hdrl — and STOP there; the
      // movi payload (virtually the whole file) is never touched.
      if (fourcc(b, 8) == "AVI ") {
        var off = 12
        while (off + 8 <= riffEnd) {
          val id = fourcc(b, off)
          val size = u32le(b, off + 4)
          val dataOff = off + 8
          val dataEnd = math.min(dataOff + size, riffEnd.toLong).toInt
          if (id == "LIST" && dataOff + 4 <= n) {
            if (fourcc(b, dataOff) == "hdrl") {
              var o2 = dataOff + 4
              while (o2 + 8 <= dataEnd) {
                val id2 = fourcc(b, o2)
                val size2 = u32le(b, o2 + 4)
                if (id2 == "avih" && size2 >= 40 && o2 + 48 <= n)
                  return Sniffed("avi", dim(u32le(b, o2 + 8 + 32)),
                    dim(u32le(b, o2 + 8 + 36)), -1, -1, -1,
                    dim(u32le(b, o2 + 8 + 16)))
                val step2 = size2 + (size2 & 1)
                if (step2 < 0 || o2 + 8L + step2 > Int.MaxValue) o2 = dataEnd
                else o2 = o2 + 8 + step2.toInt
              }
              return Sniffed("avi", -1, -1, -1, -1, -1, -1)
            }
            // a non-hdrl LIST before hdrl: skip it whole
          }
          val step = size + (size & 1)
          if (step < 0 || dataOff.toLong + step > Int.MaxValue) off = riffEnd
          else off = dataOff + step.toInt
        }
        return Sniffed("avi", -1, -1, -1, -1, -1, -1)
      }
      return unknown
    }
    unknown
  }
}
