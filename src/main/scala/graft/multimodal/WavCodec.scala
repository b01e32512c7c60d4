package graft.multimodal

/** Minimal pure-JVM RIFF/WAVE PCM codec — the LOCK-FREE fast path for the
  * audio operators.
  *
  * Why it exists: `javax.sound.sampled.AudioSystem` routes every
  * read/write through a global provider registry whose lookup CONTENDS
  * across threads — measured 0.53× "speedup" at 32 threads (i.e. slower
  * than single-threaded) on this container for encode+decode of 1k-sample
  * clips. Inside a 32-core executor that serializes the whole audio
  * decode stage; at cluster scale every executor pays it. Plain 16-bit
  * PCM WAV — the overwhelming bulk of any real audio corpus after ingest
  * normalization — needs none of that machinery: the container is a
  * 44-byte header plus raw samples. This codec parses/writes exactly
  * that, shared-nothing; callers fall back to AudioSystem for everything
  * else (AIFF, AU, compressed encodings), preserving coverage.
  *
  * Parsing is bounds-checked and total ([[parse]] never throws on
  * malformed bytes — same contract as [[AviCodec.decode]], fuzz-spec'd).
  */
object WavCodec {

  /** A parsed PCM WAV: format fields plus the data chunk's position in the
    * original byte array (no copy — readers index `bytes` directly). */
  final case class PcmWav(
      rate: Int, channels: Int, bitsPerSample: Int,
      bytes: Array[Byte], dataOff: Int, dataLen: Int) {
    def frameBytes: Int = channels * (bitsPerSample / 8)
    def nFrames: Int = if (frameBytes == 0) 0 else dataLen / frameBytes
    /** Sample `frame` of channel `ch` as a signed 16-bit value (valid when
      * bitsPerSample == 16; little-endian per the RIFF container). */
    def sample16(frame: Int, ch: Int): Short = {
      val o = dataOff + frame * frameBytes + ch * 2
      (((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)).toShort
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parse a plain-PCM RIFF/WAVE file. None for anything else — non-RIFF
    * containers, float/compressed/extensible encodings, truncated chunks —
    * the caller's cue to fall back to `AudioSystem`. Never throws. */
  def parse(b: Array[Byte]): Option[PcmWav] =
    try parseUnsafe(b)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseUnsafe(b: Array[Byte]): Option[PcmWav] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var rate = 0
    var channels = 0
    var bits = 0
    var haveFmt = false
    var dataOff = -1
    var dataLen = 0
    var off = 12
    val end = math.min(b.length.toLong, 8L + u32(b, 4)).toInt
    while (off + 8 <= end) {
      val size = u32(b, off + 4)
      if (size < 0 || off + 8 + size > end) return None // truncated: refuse, fall back
      val dOff = off + 8
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' && b(off + 3) == ' ') {
        if (size < 16) return None
        val audioFormat = u16(b, dOff)
        if (audioFormat != 1) return None // PCM only; floats/extensible -> fallback
        channels = u16(b, dOff + 2)
        rate = u32(b, dOff + 4).toInt
        bits = u16(b, dOff + 14)
        haveFmt = true
      } else if (b(off) == 'd' && b(off + 1) == 'a' && b(off + 2) == 't' && b(off + 3) == 'a') {
        dataOff = dOff
        dataLen = size.toInt
      }
      off = dOff + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (!haveFmt || dataOff < 0 || rate <= 0 || channels <= 0 ||
      (bits != 8 && bits != 16)) None
    else Some(PcmWav(rate, channels, bits, b, dataOff, dataLen))
  }

  /** Canonical 44-byte-header 16-bit PCM WAV — byte layout any WAV reader
    * (including `AudioSystem`, spec-asserted) accepts. Multi-channel input
    * is frame-interleaved: `samples(frame * channels + ch)`. */
  def encodePcm16(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(rate >= 1 && channels >= 1 && samples.length % channels == 0,
      "WavCodec.encodePcm16: rate/channels must be >= 1 and samples a multiple of channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36L + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, channels); put32(24, rate.toLong)
    put32(28, rate.toLong * channels * 2) // byte rate
    put16(32, channels * 2) // block align
    put16(34, 16) // bits per sample
    putAscii(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
