package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy implicit val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def docs = Seq((1L, "hello spark"), (2L, "x")).toDF("doc_id", "text")

  test("ingest: binary payload + typed metadata struct") {
    val m = Multimodal.ingestFromText(docs, "doc_id", "text", "text/plain")
    assert(m.schema("content").dataType.typeName == "binary")
    val row = m.where(col("media_id") === 1).select("meta.byte_len", "meta.mime").collect().head
    assert(row.getLong(0) == 11L && row.getString(1) == "text/plain")
  }

  test("decode stub: deterministic features from payload bytes") {
    val d = Multimodal.decode(Multimodal.ingestFromText(docs, "doc_id", "text", "text/plain"))
      .collect().map(x => x.media_id -> x).toMap
    val one = d(1L)
    assert(one.byte_len == 11L)
    assert(one.width == (16 + 11 % 64) && one.height == (16 + (11 * 7) % 64))
    assert(one.n_frames == (1 + 11 % 8))
    assert(one.content_hash.matches("[0-9a-f]{32}"))
    // decode is pure: same input -> same output
    val d2 = Multimodal.decode(Multimodal.ingestFromText(docs, "doc_id", "text", "text/plain"))
      .collect().map(x => x.media_id -> x).toMap
    assert(d == d2)
  }

  test("resize stub: aspect-preserving fit, never upscales, dims >= 1") {
    val decoded = Multimodal.decode(Multimodal.ingestFromText(docs, "doc_id", "text", "text/plain"))
    val src = decoded.collect().map(d => d.media_id -> d).toMap
    for (maxSide <- Seq(8, 32, 1024)) {
      Multimodal.resize(decoded, maxSide).collect().foreach { r =>
        val s = src(r.media_id)
        assert(r.width >= 1 && r.height >= 1)
        assert(math.max(r.width, r.height) <= math.max(maxSide, 1))
        if (math.max(s.width, s.height) <= maxSide) {
          assert(r.width == s.width && r.height == s.height, "upscaled")
        } else {
          // aspect ratio preserved to rounding
          val srcRatio = s.width.toDouble / s.height
          val dstRatio = r.width.toDouble / r.height
          assert(math.abs(srcRatio - dstRatio) < 0.25, s"ratio drifted: $srcRatio vs $dstRatio")
        }
      }
    }
  }

  test("frame sampling: every stride-th frame, payload-free rows") {
    val frames = Multimodal.sampleFrames(
      Multimodal.decode(Multimodal.ingestFromText(docs, "doc_id", "text", "text/plain")),
      stride = 2)
    val byId = frames.collect().groupBy(_.getLong(0))
    byId.foreach { case (_, rows) =>
      val n = rows.head.getInt(1)
      assert(rows.map(_.getInt(2)).sorted.toSeq == (0 until n by 2).toSeq)
    }
  }

  test("image decode: real javax.imageio codec on generated PNG fixtures") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(5, 3, 0x000000), "image/png"),          // black 5x3
      (2L, png(2, 7, 0xffffff), "image/png"),          // white 2x7
      (3L, png(4, 4, 0x808080), "image/png"),          // mid gray 4x4
      (4L, "not an image".getBytes("UTF-8"), "image/png"), // undecodable
      (5L, "plain text".getBytes("UTF-8"), "text/plain"))  // stub path
      .toDF("media_id", "content", "mime")
    val out = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).width == 5 && out(1L).height == 3 && out(1L).n_frames == 1
      && out(1L).mean_px == 0.0)
    assert(out(2L).width == 2 && out(2L).height == 7 && out(2L).mean_px == 1.0)
    assert(out(3L).width == 4 && out(3L).height == 4
      && math.abs(out(3L).mean_px - 128.0 / 255.0) < 1e-12)
    // failed decode: degenerate all-zero metadata, content hash intact
    assert(out(4L).width == 0 && out(4L).height == 0 && out(4L).n_frames == 0
      && out(4L).byte_len == 12L)
    // non-image mime still routes through the deterministic stub
    assert(out(5L).width == (16 + 10 % 64) && out(5L).n_frames == (1 + 10 % 8))

    // real dims flow into the resize stage unchanged
    val resized = Multimodal.resize(Multimodal.decode(media.where($"media_id" === 1L)), maxSide = 2)
      .collect().head
    assert(resized.src_width == 5 && resized.src_height == 3
      && resized.width == 2 && resized.height == 1)
  }

  // ONE set of RIFF framing builders for every AVI fixture in this suite —
  // deliberately independent of AviCodec.encode (the decoder must not be
  // tested against its own sibling), but not duplicated per test either
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }
  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ body)

  private def aviBytes(w: Int, h: Int, framesRgb: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def chunk(id: String, data: Array[Byte]) = riffChunk(id, data)
    def list(typ: String, body: Array[Byte]) = riffList(typ, body)
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(framesRgb.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ Array.fill(20)(0.toByte) // biCompression = 0 (BI_RGB)
    val stride = ((w * 3 + 3) / 4) * 4
    def frame(rgb: Int): Array[Byte] = {
      val d = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = y * stride + x * 3
        d(p) = (rgb & 0xff).toByte            // B
        d(p + 1) = ((rgb >> 8) & 0xff).toByte // G
        d(p + 2) = ((rgb >> 16) & 0xff).toByte // R
      }
      d
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", framesRgb.toArray.flatMap(c => chunk("00db", frame(c))))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  test("video decode: real AVI parser on generated uncompressed fixtures") {
    import spark.implicits._
    // 3 frames of solid gray 60, 120, 180 -> mean = 120/255 exactly
    val good = aviBytes(6, 4, Seq(0x3c3c3c, 0x787878, 0xb4b4b4))
    val media = Seq(
      (1L, good, "video/avi"),
      (2L, good.take(40), "video/avi"),               // truncated
      (3L, "not a video".getBytes("UTF-8"), "video/mp4"), // wrong container
      (4L, good, "application/octet-stream"))         // non-media mime -> stub
      .toDF("media_id", "content", "mime")
    val out = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).width == 6 && out(1L).height == 4 && out(1L).n_frames == 3)
    assert(out(1L).mean_px == 120.0 / 255.0,
      s"mean ${out(1L).mean_px} != ${120.0 / 255.0}")
    assert(out(2L).width == 0 && out(2L).n_frames == 0) // degrade, don't throw
    assert(out(3L).width == 0 && out(3L).n_frames == 0)
    // stub path untouched for non-media mimes (m2/m3 oracle contract)
    assert(out(4L).width == (16 + good.length % 64))

    // frame sampling now runs off REAL frame counts
    val sampled = Multimodal.sampleFrames(
      Multimodal.decode(media.where($"media_id" === 1L)), stride = 2)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(sampled.toSeq == Seq(0, 2))
  }

  test("AviCodec: an audio stream listed BEFORE the video stream does not poison strf parsing") {
    // hand-build hdrl with an 'auds' strl (strf = fake WAVEFORMATEX whose
    // bytes at the BITMAPINFOHEADER offsets would read as bitCount=1,
    // compression=junk) ahead of the real 'vids' strl
    def chunk(id: String, d: Array[Byte]) = riffChunk(id, d)
    def list(typ: String, body: Array[Byte]) = riffList(typ, body)
    val w = 4; val h = 2
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(2) ++ le32(0) ++ le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val audStrh = "auds".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte)
    val audStrf = le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++
      le16(1) ++ Array.fill(8)(0x7f.toByte) // junk at offsets 14/16
    val vidStrh = "vids".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte)
    val vidStrf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ Array.fill(20)(0.toByte)
    val stride = ((w * 3 + 3) / 4) * 4
    val frame = Array.tabulate(stride * h)(i => if (i % stride < w * 3) 100.toByte else 0.toByte)
    val bytes = {
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", audStrh) ++ chunk("strf", audStrf)) ++
        list("strl", chunk("strh", vidStrh) ++ chunk("strf", vidStrf)))
      val movi = list("movi", chunk("00db", frame))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val v = graft.multimodal.AviCodec.decode(bytes).get
    assert(v.width == w && v.height == h && v.nFrames == 1)
    assert(v.meanLuminance == 100.0 / 255.0)
  }

  test("AviCodec fuzz: random bytes and corrupted valid files never throw") {
    // the parser consumes untrusted payloads inside executors — any
    // uncaught throw is a job-killer, so decode must return None/Some,
    // never raise. 3000 cases: pure noise, truncations, and single-byte
    // corruptions of a valid file (the nastiest inputs: almost-valid
    // headers with poisoned sizes/offsets).
    val valid = graft.multimodal.AviCodec.encode(
      6, 4, Seq(Array.fill(24)(0x123456), Array.fill(24)(0x654321)))
    val rnd = new scala.util.Random(42)
    for (i <- 0 until 1000) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      graft.multimodal.AviCodec.decode(junk) // must not throw
    }
    for (_ <- 0 until 1000)
      graft.multimodal.AviCodec.decode(valid.take(rnd.nextInt(valid.length)))
    for (_ <- 0 until 1000) {
      val mutated = valid.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      graft.multimodal.AviCodec.decode(mutated)
    }
    // and the untouched file still decodes after all that
    assert(graft.multimodal.AviCodec.decode(valid).exists(_.nFrames == 2))
  }

  test("AviCodec roundtrip: encode then decode recovers dims, frames, and exact mean") {
    // non-solid frames so the bottom-up row flip is actually exercised
    val w = 5; val h = 3
    val f1 = Array.tabulate(w * h)(i => (i * 17 % 256) * 0x010101)
    val f2 = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256) * 0x010101)
    val bytes = graft.multimodal.AviCodec.encode(w, h, Seq(f1, f2))
    val v = graft.multimodal.AviCodec.decode(bytes).get
    assert(v.width == w && v.height == h && v.nFrames == 2)
    val lum = (f1 ++ f2).map(p => ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3.0)
    assert(v.meanLuminance == lum.sum / lum.length / 255.0)
  }

  test("AviCodec MJPEG: solid-gray roundtrip is bit-exact for ALL 256 gray levels") {
    // the m7 oracle's entire premise: quality-1.0 JPEG has all-ones quant
    // tables, so a solid frame's DC term is unquantized and every AC term
    // is zero — decode returns exactly the encoded gray. Verify the full
    // gray range, not a sample: one unrepresentable level anywhere breaks
    // the formula oracle for some doc_id.
    for (g <- 0 until 256) {
      val px = Array.fill(8 * 6)((g << 16) | (g << 8) | g)
      val bytes = graft.multimodal.AviCodec.encodeMjpeg(8, 6, Seq(px, px))
      val v = graft.multimodal.AviCodec.decode(bytes).get
      assert(v.width == 8 && v.height == 6 && v.nFrames == 2)
      assert(v.meanLuminance == g / 255.0, s"gray $g: ${v.meanLuminance} != ${g / 255.0}")
    }
  }

  test("AviCodec MJPEG: non-solid frames decode within JPEG tolerance; corrupt frame degrades") {
    val w = 16; val h = 8
    val f = Array.tabulate(w * h)(i => ((i * 13) % 256) * 0x010101)
    val bytes = graft.multimodal.AviCodec.encodeMjpeg(w, h, Seq(f))
    val v = graft.multimodal.AviCodec.decode(bytes).get
    assert(v.width == w && v.height == h && v.nFrames == 1)
    val trueMean = f.map(p => (p & 0xff).toDouble).sum / f.length / 255.0
    assert(math.abs(v.meanLuminance - trueMean) < 3.0 / 255.0,
      s"lossy mean ${v.meanLuminance} too far from $trueMean")
    // poison every JPEG SOI marker: frames still COUNT (the chunk is a
    // frame slot) but contribute no pixels — mean degrades to 0, no throw
    val broken = bytes.clone()
    var i = 0
    while (i + 1 < broken.length) {
      if ((broken(i) & 0xff) == 0xff && (broken(i + 1) & 0xff) == 0xd8) broken(i) = 0
      i += 1
    }
    val bv = graft.multimodal.AviCodec.decode(broken).get
    assert(bv.nFrames == 1 && bv.meanLuminance == 0.0)
  }

  test("AviCodec: frames nested in 'rec ' LISTs inside movi are counted (interleaved AVIs)") {
    // interleaved writers group each interleave unit's chunks in a
    // LIST('rec ') inside movi; inMovi must propagate through those —
    // and NOT through unrelated list types
    def chunk(id: String, d: Array[Byte]) = riffChunk(id, d)
    def list(typ: String, body: Array[Byte]) = riffList(typ, body)
    val w = 4; val h = 2
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ Array.fill(20)(0.toByte)
    val stride = ((w * 3 + 3) / 4) * 4
    val frame = Array.tabulate(stride * h)(i => if (i % stride < w * 3) 60.toByte else 0.toByte)
    def fileWith(movi: Array[Byte]): Array[Byte] = {
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // both frames inside a rec LIST -> both counted, luminance accumulated
    val nested = fileWith(list("movi",
      list("rec ", chunk("00db", frame) ++ chunk("00db", frame))))
    val v = graft.multimodal.AviCodec.decode(nested).get
    assert(v.nFrames == 2, s"rec-nested frames not counted: ${v.nFrames}")
    assert(v.meanLuminance == 60.0 / 255.0)
    // a NON-rec list inside movi does not leak movi scope into its chunks
    val stray = fileWith(list("movi",
      chunk("00db", frame) ++ list("odml", chunk("00db", frame))))
    assert(graft.multimodal.AviCodec.decode(stray).get.nFrames == 1)
  }

  test("AviCodec MJPEG fuzz: noise, truncation, corruption never throw") {
    // same contract as the BI_RGB fuzz, over the MJPEG encoder's output —
    // the JPEG reader sees poisoned streams and must degrade, not raise
    val valid = graft.multimodal.AviCodec.encodeMjpeg(
      8, 6, Seq(Array.fill(48)(0x804020), Array.fill(48)(0x204080)))
    val rnd = new scala.util.Random(1042)
    for (_ <- 0 until 500)
      graft.multimodal.AviCodec.decode(valid.take(rnd.nextInt(valid.length)))
    for (_ <- 0 until 500) {
      val mutated = valid.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      graft.multimodal.AviCodec.decode(mutated)
    }
    assert(graft.multimodal.AviCodec.decode(valid).exists(_.nFrames == 2))
  }

  test("extractFrames: pixel-exact PNG payloads, top-down orientation, stride, both codecs") {
    import spark.implicits._
    // NON-solid, vertically-asymmetric frames: if decodeFrames forgot to
    // flip the bottom-up DIB rows, the pixel compare fails
    val w = 6; val h = 4
    def frame(seed: Int): Array[Int] =
      Array.tabulate(w * h)(i => ((i * 29 + seed * 97) % 256) * 0x010101)
    val f0 = frame(0); val f1 = frame(1); val f2 = frame(2)
    val avi = graft.multimodal.AviCodec.encode(w, h, Seq(f0, f1, f2))
    // solid frames for the MJPEG face (lossy otherwise)
    val s0 = Array.fill(w * h)(0x404040); val s2 = Array.fill(w * h)(0xb0b0b0)
    val mjpg = graft.multimodal.AviCodec.encodeMjpeg(w, h, Seq(s0, Array.fill(w * h)(0x808080), s2))
    val media = Seq(
      (1L, avi, "video/avi"),
      (2L, mjpg, "video/avi"),
      (3L, avi, "text/plain"), // non-video mime: no rows
      (4L, "junk".getBytes("UTF-8"), "video/avi")) // undecodable: no rows
      .toDF("media_id", "content", "mime")
    val out = Multimodal.extractFrames(media, stride = 2).collect()
      .groupBy(_.media_id)
    assert(!out.contains(3L) && !out.contains(4L))
    // stride 2 of 3 frames -> indices 0 and 2
    val m1 = out(1L).sortBy(_.frame_idx)
    assert(m1.map(_.frame_idx).toSeq == Seq(0, 2))
    for ((fr, src) <- m1.zip(Seq(f0, f2))) {
      assert(fr.width == w && fr.height == h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame_png))
      val got = Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xffffff)
      assert(got.toSeq == src.toSeq, s"frame ${fr.frame_idx} pixels diverged")
    }
    val m2f = out(2L).sortBy(_.frame_idx)
    assert(m2f.map(_.frame_idx).toSeq == Seq(0, 2))
    for ((fr, src) <- m2f.zip(Seq(s0, s2))) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame_png))
      val got = Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xffffff)
      assert(got.toSeq == src.toSeq, s"MJPEG solid frame ${fr.frame_idx} not exact")
    }
  }

  test("MediaSniff: header-only fields for all seven real encoders; truncation/corruption never throws") {
    import graft.multimodal.{AviCodec, MediaSniff, WavCodec}
    val px = Array.tabulate(7 * 5)(i => (i * 11 % 256) * 0x010101)
    assert(MediaSniff.sniff(Multimodal.encodeImage("png", 7, 5, px)) ==
      MediaSniff.Sniffed("png", 7, 5, 8, -1, -1, -1))
    assert(MediaSniff.sniff(Multimodal.encodeImage("jpeg", 7, 5, px)) ==
      MediaSniff.Sniffed("jpeg", 7, 5, 8, 3, -1, -1))
    assert(MediaSniff.sniff(Multimodal.encodeImage("gif", 7, 5, px)) ==
      MediaSniff.Sniffed("gif", 7, 5, -1, -1, -1, -1))
    assert(MediaSniff.sniff(Multimodal.encodeImage("bmp", 7, 5, px)) ==
      MediaSniff.Sniffed("bmp", 7, 5, 24, -1, -1, -1))
    assert(MediaSniff.sniff(
      WavCodec.encodePcm16(11025, 2, Array.tabulate[Short](60)(_.toShort))) ==
      MediaSniff.Sniffed("wav", -1, -1, 16, 2, 11025, 30))
    val avi = AviCodec.encode(7, 5, Seq(px, px, px))
    assert(MediaSniff.sniff(avi) == MediaSniff.Sniffed("avi", 7, 5, -1, -1, -1, 3))
    // TIFF: the JDK writer emits big-endian with BitsPerSample behind an
    // offset (count 3 > inline capacity) — both paths exercised
    assert(MediaSniff.sniff(Multimodal.encodeImage("tiff", 7, 5, px)) ==
      MediaSniff.Sniffed("tiff", 7, 5, 8, 3, -1, -1))
    // hand-built LITTLE-endian TIFF: II*\0, IFD@8 with inline SHORT
    // width/height — the other byte order and the inline-value path
    val leTiff = Array[Byte]('I', 'I', 0x2a, 0, 8, 0, 0, 0, // header, ifd@8
      3, 0, // 3 entries
      0, 1, 3, 0, 1, 0, 0, 0, 7, 0, 0, 0, // tag 256 SHORT x1 = 7
      1, 1, 3, 0, 1, 0, 0, 0, 5, 0, 0, 0, // tag 257 SHORT x1 = 5
      2, 1, 3, 0, 2, 0, 0, 0, 8, 0, 8, 0, // tag 258 SHORT x2 = [8,8] INLINE
      0, 0, 0, 0) // next-IFD pointer
    // two SHORTs fit the 4-byte value field: TIFF 6.0 inlines them (a
    // gray+alpha BitsPerSample) — must NOT be chased as an offset
    assert(MediaSniff.sniff(leTiff) == MediaSniff.Sniffed("tiff", 7, 5, 8, -1, -1, -1))
    // nonstandard LONG-typed single BitsPerSample still reads; a
    // malformed count-0 entry leaves the sentinel instead of reading
    // garbage from the value field
    val leTiff2 = Array[Byte]('I', 'I', 0x2a, 0, 8, 0, 0, 0,
      2, 0,
      0, 1, 3, 0, 1, 0, 0, 0, 7, 0, 0, 0, // tag 256 SHORT x1 = 7
      2, 1, 4, 0, 1, 0, 0, 0, 16, 0, 0, 0, // tag 258 LONG x1 = 16
      0, 0, 0, 0)
    assert(MediaSniff.sniff(leTiff2) == MediaSniff.Sniffed("tiff", 7, -1, 16, -1, -1, -1))
    val leTiff0 = Array[Byte]('I', 'I', 0x2a, 0, 8, 0, 0, 0,
      1, 0,
      2, 1, 3, 0, 0, 0, 0, 0, 9, 0, 0, 0, // tag 258 SHORT x0 (malformed)
      0, 0, 0, 0)
    assert(MediaSniff.sniff(leTiff0).bitDepth == -1)
    assert(MediaSniff.sniff(AviCodec.encodeMjpeg(7, 5, Seq(px))).format == "avi")
    // header-ONLY: cutting the file at the movi LIST (no frame bytes at
    // all) sniffs identically — the payload is never read
    val moviAt = (0 until avi.length - 4).find(i =>
      avi(i) == 'm' && avi(i + 1) == 'o' && avi(i + 2) == 'v' && avi(i + 3) == 'i').get
    assert(MediaSniff.sniff(java.util.Arrays.copyOf(avi, moviAt - 8)) ==
      MediaSniff.Sniffed("avi", 7, 5, -1, -1, -1, 3))
    // PROGRESSIVE JPEG (SOF2, preceded by different segment structure):
    // the marker walk must reach the frame header regardless of which
    // SOFn variant the encoder emits
    val pimg = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    pimg.setRGB(0, 0, 7, 5, px, 0, 7)
    val pbos = new java.io.ByteArrayOutputStream()
    val pw = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val p = pw.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(pbos)
      pw.setOutput(out)
      pw.write(null, new javax.imageio.IIOImage(pimg, null, null), p)
      out.close()
    } finally pw.dispose()
    assert(MediaSniff.sniff(pbos.toByteArray) ==
      MediaSniff.Sniffed("jpeg", 7, 5, 8, 3, -1, -1))
    // GIF87a (older version tag) sniffs the same as 89a
    val gif87 = Multimodal.encodeImage("gif", 7, 5, px).clone()
    gif87(4) = '7'.toByte
    assert(MediaSniff.sniff(gif87) == MediaSniff.Sniffed("gif", 7, 5, -1, -1, -1, -1))
    // truncated BMP keeps its format tag with -1 fields (consistent with
    // the other branches); a corrupt sign-extreme biHeight clamps to -1
    val bmp = Multimodal.encodeImage("bmp", 7, 5, px)
    assert(MediaSniff.sniff(java.util.Arrays.copyOf(bmp, 20)) ==
      MediaSniff.Sniffed("bmp", -1, -1, -1, -1, -1, -1))
    val minHeight = bmp.clone()
    minHeight(22) = 0; minHeight(23) = 0; minHeight(24) = 0; minHeight(25) = 0x80.toByte
    assert(MediaSniff.sniff(minHeight).height == -1, "abs(Int.MinValue) must clamp, not leak")
    // non-zero BITMAPFILEHEADER reserved words: not a BMP
    val badReserved = bmp.clone(); badReserved(7) = 1
    assert(MediaSniff.sniff(badReserved).format == null)
    // total on garbage: random bytes, every truncation of every fixture,
    // and random single-byte corruptions — never throws
    val fixtures = Seq(
      Multimodal.encodeImage("png", 7, 5, px), Multimodal.encodeImage("jpeg", 7, 5, px),
      Multimodal.encodeImage("gif", 7, 5, px), Multimodal.encodeImage("bmp", 7, 5, px),
      Multimodal.encodeImage("tiff", 7, 5, px),
      WavCodec.encodePcm16(8000, 1, Array.tabulate[Short](40)(_.toShort)), avi)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b)
      MediaSniff.sniff(b)
    }
    for (f <- fixtures) {
      for (len <- 0 to math.min(f.length, 80)) MediaSniff.sniff(java.util.Arrays.copyOf(f, len))
      for (_ <- 1 to 200) {
        val c = f.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        MediaSniff.sniff(c)
      }
    }
  }

  test("sniffMedia: codegen'd plan, sentinel->null mapping, unknown bytes -> all-null row") {
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.encodeImage("png", 3, 2, Array.fill(6)(0x123456)), "application/octet-stream"),
      (2L, "definitely not media".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("media_id", "content", "mime")
    // repartition keeps the local fixture from constant-folding into a
    // LocalTableScan, so the executed plan actually shows the expression
    val out = Multimodal.sniffMedia(media.repartition(2))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    // inspect AFTER the action so AQE's final plan (with codegen spans) prints
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_media_sniff"), "sniff should be a native expression in the plan")
    // the "*(n)" stage prefix is the whole-stage-codegen marker in this format
    assert(plan.contains("*(1) Project"), "sniff should run inside whole-stage codegen")
    val png = rows(1L)
    assert(png.getString(1) == "png" && png.getInt(2) == 3 && png.getInt(3) == 2 &&
      png.getInt(4) == 8 && png.isNullAt(5) && png.isNullAt(6) && png.isNullAt(7))
    val unk = rows(2L)
    assert((1 to 7).forall(unk.isNullAt), "unknown payload must yield all-null fields")
  }

  test("audioResample: identity rate is lossless; ramps interpolate exactly; output re-parses") {
    import spark.implicits._
    import graft.multimodal.WavCodec
    val ramp = Array.tabulate[Short](50)(i => (-20 + 3 * i).toShort)
    val media = Seq(
      (1L, WavCodec.encodePcm16(16000, 1, ramp), "audio/wav"),
      (2L, WavCodec.encodePcm16(8000, 1, ramp), "audio/wav"),     // upsample 2x
      (3L, WavCodec.encodePcm16(32000, 1, ramp), "audio/wav"),    // downsample 2x
      (4L, "not audio".getBytes("UTF-8"), "audio/wav"))           // corrupt: no row
      .toDF("media_id", "content", "mime")
    val out = Multimodal.audioResample(media, 16000).collect()
      .map(r => r.media_id -> r).toMap
    assert(!out.contains(4L))
    // identity: same frame count, byte-identical samples
    val id16 = WavCodec.parse(out(1L).content).get
    assert(out(1L).n_out == 50 && id16.rate == 16000 && id16.nFrames == 50)
    assert((0 until 50).forall(i => id16.sample16(i, 0) == ramp(i)))
    // 2x upsample of a ramp: every midpoint lands exactly between
    // neighbors (linear of linear), floor(v+0.5) rounds the half up
    val up = WavCodec.parse(out(2L).content).get
    assert(out(2L).n_out == 99 && up.rate == 16000)
    assert((0 until 49).forall { i =>
      up.sample16(2 * i, 0) == ramp(i) &&
        up.sample16(2 * i + 1, 0) ==
          math.floor((ramp(i) + ramp(i + 1)) / 2.0 + 0.5).toInt
    })
    // 2x downsample: every other source sample, last included
    val down = WavCodec.parse(out(3L).content).get
    assert(out(3L).n_out == 25)
    assert((0 until 25).forall(i => down.sample16(i, 0) == ramp(2 * i)))
    assert(out(3L).sum_out == (0 until 25).map(i => ramp(2 * i).toLong).sum)
  }

  test("patchify: exact block means on a gradient; partial edges dropped; non-images vanish") {
    import spark.implicits._
    // 10x6 gradient gray = 16x + y, patch 4: grid is 2x1, the right 2
    // columns and bottom 2 rows are dropped (the ViT convention)
    val w = 10; val h = 6
    val px = Array.tabulate(w * h) { i =>
      val g = 16 * (i % w) + i / w
      (g << 16) | (g << 8) | g
    }
    val media = Seq(
      (1L, Multimodal.encodeImage("png", w, h, px), "image/png"),
      (2L, "junk".getBytes("UTF-8"), "image/png"),
      (3L, Multimodal.encodeImage("png", w, h, px), "text/plain"))
      .toDF("media_id", "content", "mime")
    val out = Multimodal.patchify(media, 4).collect()
    assert(out.forall(_.media_id == 1L), "only the decodable image yields patches")
    val byPos = out.map(p => (p.px, p.py) -> p.mean_lum).toMap
    assert(byPos.keySet == Set((0, 0), (1, 0)))
    def expected(pxi: Int): Double = {
      var lum = 0.0
      for (dy <- 0 until 4; dx <- 0 until 4)
        lum += 16 * (pxi * 4 + dx) + dy
      lum / 16 / 255.0
    }
    assert(byPos((0, 0)) == expected(0) && byPos((1, 0)) == expected(1))
    // a patch larger than the image yields nothing rather than a crash
    assert(Multimodal.patchify(media.where(col("media_id") === 1L), 16).count() == 0)
  }

  test("expandZipShards: exact member round-trip; dirs skipped; corrupt/oversized degrade") {
    import spark.implicits._
    def zip(entries: (String, Array[Byte])*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      for ((name, data) <- entries) {
        z.putNextEntry(new java.util.zip.ZipEntry(name))
        z.write(data)
        z.closeEntry()
      }
      z.close()
      bos.toByteArray
    }
    val d1 = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val d2 = "caption text".getBytes("UTF-8")
    val good = zip("s/0.img" -> d1, "s/" -> Array.emptyByteArray, "s/0.txt" -> d2)
    val shards = Seq(
      (1L, good),
      (2L, "definitely not a zip".getBytes("UTF-8")),
      (3L, zip()), // empty archive
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("shard_id", "content")
    val out = Multimodal.expandZipShards(shards).collect().groupBy(_.shard_id)
    val m = out(1L).sortBy(_.member_idx)
    // directory entry skipped; members in order with exact bytes
    assert(m.map(x => (x.member_idx, x.member_name, x.byte_len)).toSeq ==
      Seq((0, "s/0.img", 100L), (1, "s/0.txt", 12L)))
    assert(m(0).content.toSeq == d1.toSeq && m(1).content.toSeq == d2.toSeq)
    assert(!out.contains(2L) && !out.contains(3L) && !out.contains(4L))
    // truncated archive: members before the cut survive, no throw
    val trunc = Seq((9L, good.take(good.length / 2))).toDF("shard_id", "content")
    Multimodal.expandZipShards(trunc).collect() // must not throw
    // oversized member skipped whole under a tiny cap — and it leaves an
    // INDEX GAP: member_idx is archive position, the (shard, idx) pairing
    // key must not shift when a sibling is dropped
    val capped = Multimodal.expandZipShards(
      Seq((5L, good)).toDF("shard_id", "content"), maxMemberBytes = 50)
      .collect()
    assert(capped.map(m => (m.member_name, m.member_idx)).toSeq == Seq(("s/0.txt", 1)),
      "the 100-byte member must be skipped whole at cap 50, leaving idx 0 vacant")
    // per-SHARD total cap: the classic zip bomb is many small members —
    // expansion stops once the kept total reaches the cap (prefix kept)
    val many = zip((0 until 5).map(j => s"m$j" -> Array.fill[Byte](100)('a')): _*)
    val totalCapped = Multimodal.expandZipShards(
      Seq((6L, many)).toDF("shard_id", "content"), maxShardBytes = 150L)
      .collect()
    assert(totalCapped.map(_.member_name).toSeq == Seq("m0", "m1"),
      "expansion must stop at the shard total cap")
    // "no cap" sentinel: Int.MaxValue must not overflow into zero members
    val uncapped = Multimodal.expandZipShards(
      Seq((7L, good)).toDF("shard_id", "content"), maxMemberBytes = Int.MaxValue)
      .collect()
    assert(uncapped.length == 2)
  }

  test("zip + gunzip randomized round-trips; corrupted payloads never throw") {
    import spark.implicits._
    import graft.functions.CompressionFunctions
    val rnd = new scala.util.Random(23)
    // random member sets: names, sizes, binary contents round-trip exactly
    val shards = (1L to 8L).map { sid =>
      val members = (0 until 1 + rnd.nextInt(5)).map { j =>
        val data = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(data)
        s"s$sid/m$j" -> data
      }
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      for ((n, d) <- members) {
        z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(d); z.closeEntry()
      }
      z.close()
      (sid, members, bos.toByteArray)
    }
    val out = Multimodal.expandZipShards(
      shards.map(s => (s._1, s._3)).toDF("shard_id", "content"))
      .collect().groupBy(_.shard_id)
    for ((sid, members, _) <- shards) {
      val got = out(sid).sortBy(_.member_idx)
      assert(got.map(_.member_name).toSeq == members.map(_._1))
      assert(got.zip(members).forall { case (g, (_, d)) => g.content.toSeq == d.toSeq })
    }
    // gunzip round-trips arbitrary bytes; flipped-byte corruptions only
    // ever yield null or a value, never an exception
    for (_ <- 1 to 30) {
      val data = new Array[Byte](rnd.nextInt(500)); rnd.nextBytes(data)
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(data); g.close()
      val gz = bos.toByteArray
      val expr = graft.functions.GunzipBytes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(gz)), 1 << 20)
      assert(expr.gunzip(gz).toSeq == data.toSeq)
      val bad = gz.clone(); bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      expr.gunzip(bad) // null or bytes — never throws
    }
    // fully fused check through the Column face too
    val roundtrip = shards.map { case (sid, _, zipBytes) =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(zipBytes); g.close()
      (sid, bos.toByteArray, zipBytes)
    }
    val viaCol = roundtrip.map(r => (r._1, r._2)).toDF("id", "gz")
      .select(col("id"), CompressionFunctions.gunzip(col("gz")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("b")).toMap
    assert(roundtrip.forall { case (sid, _, orig) => viaCol(sid).toSeq == orig.toSeq })
  }

  test("GunzipBytes: exact inverse of gzip; corrupt -> null; bomb cap -> null; codegen plan") {
    import spark.implicits._
    import graft.functions.CompressionFunctions
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(data); g.close()
      bos.toByteArray
    }
    val text = "round trip me exactly, please — naïve UTF-8 too"
    val rows = Seq(
      (1L, gz(text.getBytes("UTF-8"))),
      (2L, "not gzip".getBytes("UTF-8")),
      (3L, gz(Array.fill[Byte](100)('y'))))
      .toDF("id", "gz")
      .repartition(2)
    val out = rows.select(col("id"), CompressionFunctions.gunzipText(col("gz")).as("t"))
    val got = out.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains(text))
    assert(got(2L).isEmpty, "non-gzip must degrade to null, not throw")
    assert(got(3L).contains("y" * 100))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_gunzip"))
    // cap: the 100-byte payload under maxBytes=50 nulls out (bomb guard)
    val cappedRow = rows.where(col("id") === 3L)
      .select(CompressionFunctions.gunzip(col("gz"), maxBytes = 50).as("b"))
      .collect().head
    assert(cappedRow.isNullAt(0))
    // "no cap" sentinel: Int.MaxValue must not overflow into all-null
    val unCapped = rows.where(col("id") === 1L)
      .select(CompressionFunctions.gunzipText(col("gz"), maxBytes = Int.MaxValue).as("t"))
      .collect().head
    assert(unCapped.getString(0) == text)
    // INVALID UTF-8 inside a valid gzip stream must not kill the scan
    // (Spark 4's decode() throws MALFORMED_CHARACTER_CODING; the cast
    // carries the bytes through like any parquet string column)
    val badUtf8 = Seq(Tuple1(gz(Array(0xc3.toByte, 0x28.toByte, 'o'.toByte, 'k'.toByte))))
      .toDF("gz")
      .select(CompressionFunctions.gunzipText(col("gz")).as("t"))
      .collect().head
    assert(!badUtf8.isNullAt(0), "latin-1-ish bytes must degrade, not throw or null")
  }

  test("resizeImages: gradient downscale by 2 is the exact 2x2 block mean, pixel for pixel") {
    import spark.implicits._
    // 8x8 gradient: px(x,y) = 16*(y*8+x) in each channel — every 2x2 block
    // mean is exactly computable, so the area resampler's output is pinned
    // exactly (integral scale factor => pure block mean, no fractional
    // coverage)
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = math.min(255, 16 * (y * 8 + x) % 256)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, bos.toByteArray, "image/png")).toDF("media_id", "content", "mime")
    val out = Multimodal.resizeImages(media, maxSide = 4).collect().head
    assert(out.src_width == 8 && out.src_height == 8 && out.width == 4 && out.height == 4)
    val res = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert(res.getWidth == 4 && res.getHeight == 4)
    for (oy <- 0 until 4; ox <- 0 until 4) {
      val vals = for (dy <- 0 to 1; dx <- 0 to 1)
        yield math.min(255, 16 * ((oy * 2 + dy) * 8 + ox * 2 + dx) % 256)
      val expected = math.round(vals.sum / 4.0).toInt
      val got = res.getRGB(ox, oy) & 0xff
      assert(got == expected, s"pixel ($ox,$oy): got $got expected $expected")
    }
  }

  test("areaResample preserves the global mean on random images (up to per-pixel rounding)") {
    // the box filter is a weighted average with total weight = area, so the
    // output's global mean equals the input's exactly before rounding; the
    // rounding moves each output pixel < 0.5, hence the mean < 0.5/255
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val (w, h) = (7 + rnd.nextInt(40), 5 + rnd.nextInt(40))
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      def mean(im: java.awt.image.BufferedImage): Double = {
        val vs = for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
          yield (im.getRGB(x, y) & 0xff).toDouble
        vs.sum / vs.size
      }
      val (ow, oh) = (1 + rnd.nextInt(w), 1 + rnd.nextInt(h))
      val out = Multimodal.areaResample(img, ow, oh)
      assert(out.getWidth == ow && out.getHeight == oh)
      assert(math.abs(mean(out) - mean(img)) <= 0.5 + 1e-9,
        s"seed=$seed ${w}x$h->${ow}x$oh mean drifted ${mean(out)} vs ${mean(img)}")
      for (y <- 0 until oh; x <- 0 until ow) {
        val p = out.getRGB(x, y)
        assert(((p >> 16) & 0xff) == (p & 0xff), "gray input must stay gray")
      }
    }
  }

  test("resizeImages: solid image mean is resampler-invariant; no-downscale passes through") {
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.solidPng(200, 100, 40), "image/png"), // downscales (long side 100)
      (2L, Multimodal.solidPng(37, 10, 6), "image/png"),    // fits, no resample
      (3L, "nope".getBytes("UTF-8"), "image/png"),          // undecodable
      (4L, Multimodal.solidPng(9, 5, 5), "text/plain"))     // non-image mime
      .toDF("media_id", "content", "mime")
    val out = Multimodal.resizeImages(media, maxSide = 48)
      .collect().map(r => r.media_id -> r).toMap
    // aspect fit: 100x40 -> 48x19 (40*0.48 = 19.2 -> 19)
    assert(out(1L).width == 48 && out(1L).height == 19)
    assert(out(1L).mean_px == 200.0 / 255.0) // exact: box mean of a constant
    assert(out(2L).width == 10 && out(2L).height == 6 && out(2L).mean_px == 37.0 / 255.0)
    // the re-encoded payload decodes back to the same solid pixels
    val re = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(2L).content))
    assert(re.getWidth == 10 && (re.getRGB(3, 3) & 0xffffff) == 0x252525)
    assert(out(3L).width == 0 && out(3L).content.isEmpty)
    assert(out(4L).width == 0 && out(4L).content.isEmpty)
  }

  test("perceptual hash: re-encoded image pairs at hamming 0; perturbed within 3; distinct far") {
    import spark.implicits._
    // 16x16 half-dark/half-bright base; aHash = stable bright-half pattern
    def img(perturb: Boolean, bright: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        im.setRGB(x, y, if (x < 8) 0x101010 else bright)
      if (perturb) im.setRGB(0, 0, 0xf0f0f0) // one bright pixel flips ≤1 grid cell
      im
    }
    def bytes(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, bytes(img(perturb = false, 0xe0e0e0), "png"), "image/png"),
      (2L, bytes(img(perturb = false, 0xe0e0e0), "bmp"), "image/bmp"), // re-encode of 1
      (3L, bytes(img(perturb = true, 0xe0e0e0), "png"), "image/png"),  // near-dup of 1
      (4L, { // inverted layout: far from everything
        val im = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, if (x < 8) 0xe0e0e0 else 0x101010)
        bytes(im, "png")
      }, "image/png"))
      .toDF("media_id", "content", "mime")
    val grids = Multimodal.luminanceGrid(media).toDF()
    val pairs = Multimodal.perceptualHashPairs(grids, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    assert(pairs((1L, 2L)) == 0L) // identical pixels, different container format
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3L)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("luminanceGrid: stub formula for non-image mimes; undecodable image is all-zero") {
    import spark.implicits._
    val media = Seq(
      (1L, "plain text!".getBytes("UTF-8"), "text/plain"),     // 11 bytes → stub
      (2L, "not an image".getBytes("UTF-8"), "image/png"))     // undecodable
      .toDF("media_id", "content", "mime")
    val out = Multimodal.luminanceGrid(media).collect().map(g => g.media_id -> g).toMap
    val expected = Array.tabulate(64)(j => ((11L * (j + 1) * 2654435761L) % 256).toDouble / 255.0)
    assert(out(1L).gray.toSeq == expected.toSeq && out(1L).byte_len == 11L)
    assert(out(2L).gray.forall(_ == 0.0))
  }

  test("perceptual hash: degenerate (constant/undecodable) grids never pair with each other") {
    import spark.implicits._
    def solid(rgb: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    // two corrupt payloads + a solid-black and a solid-white image: all
    // four have the degenerate hash 0 and would otherwise emit 6 false
    // hamming-0 pairs (black "equals" white under aHash)
    val media = Seq(
      (1L, "garbage one".getBytes("UTF-8"), "image/png"),
      (2L, "garbage two".getBytes("UTF-8"), "image/png"),
      (3L, solid(0x000000), "image/png"),
      (4L, solid(0xffffff), "image/png"))
      .toDF("media_id", "content", "mime")
    val pairs = Multimodal.perceptualHashPairs(
      Multimodal.luminanceGrid(media).toDF(), maxHamming = 3).collect()
    assert(pairs.isEmpty)
  }

  test("audio decode: real javax.sound.sampled codec on generated WAV fixtures") {
    import spark.implicits._
    // full-scale/2 square wave: every sample is ±16384 → mean |amp| is
    // EXACTLY 0.5; 8000 Hz mono, 2000 frames
    def wav(frames: Int, rate: Float, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * 2 * channels)
      var i = 0
      while (i < pcm.length) {
        val s: Short = if ((i / (2 * channels)) % 2 == 0) 16384 else -16384
        pcm(i) = (s & 0xff).toByte
        pcm(i + 1) = ((s >> 8) & 0xff).toByte
        i += 2
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, wav(2000, 8000f, 1), "audio/wav"),
      (2L, wav(300, 44100f, 2), "audio/wav"),
      (3L, "definitely not audio".getBytes("UTF-8"), "audio/wav"), // undecodable
      (4L, wav(100, 8000f, 1), "video/mp4")) // video mime, non-AVI payload
      .toDF("media_id", "content", "mime")
    val out = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    // width = sample rate, height = channels, n_frames = audio frames
    assert(out(1L).width == 8000 && out(1L).height == 1 && out(1L).n_frames == 2000)
    assert(out(1L).mean_px == 0.5)
    assert(out(2L).width == 44100 && out(2L).height == 2 && out(2L).n_frames == 300)
    assert(out(2L).mean_px == 0.5)
    // undecodable audio degrades to the all-zero row, hash intact
    assert(out(3L).width == 0 && out(3L).n_frames == 0 && out(3L).byte_len == 20L)
    // video mime now runs the real AVI parser: a WAV payload is not an
    // uncompressed AVI, so it degrades to the all-zero row
    assert(out(4L).width == 0 && out(4L).n_frames == 0)
  }

  test("WavCodec: cross-compatible with AudioSystem both directions; AIFF falls back; fuzz-safe") {
    import spark.implicits._
    val samples = Array.tabulate[Short](500)(i => ((i * 37) % 20000 - 10000).toShort)
    // 1) WavCodec's writer is a standard WAV: AudioSystem reads it back
    //    sample-for-sample
    val ours = graft.multimodal.WavCodec.encodePcm16(8000, 1, samples)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(ours))
    assert(ais.getFormat.getSampleRate == 8000f && ais.getFormat.getChannels == 1)
    val back = ais.readAllBytes()
    assert(back.length == 1000)
    for (i <- samples.indices)
      assert((((back(2 * i + 1) & 0xff) << 8) | (back(2 * i) & 0xff)).toShort == samples(i))
    // 2) AudioSystem's writer parses through WavCodec with the same fields
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 2, true, false)
    val pcm = new Array[Byte](400)
    new scala.util.Random(5).nextBytes(pcm)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 100),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val parsed = graft.multimodal.WavCodec.parse(bos.toByteArray).get
    assert(parsed.rate == 44100 && parsed.channels == 2 &&
      parsed.bitsPerSample == 16 && parsed.nFrames == 100)
    // 3) an AIFF clip is NOT claimed by WavCodec (parse None) but still
    //    decodes through the AudioSystem fallback of audioSpectral
    // quarter-rate tone, big-endian samples (AIFF is BE)
    val bePcm = Array.tabulate[Byte](2048) { i =>
      val f = i / 2
      val s: Short = (f % 4 match {
        case 1 => 12000
        case 3 => -12000
        case _ => 0
      }).toShort
      if (i % 2 == 0) ((s >> 8) & 0xff).toByte else (s & 0xff).toByte
    }
    val beFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val aiffAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bePcm), beFmt, 1024)
    val aiffBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(aiffAis,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, aiffBos)
    val aiff = aiffBos.toByteArray
    assert(graft.multimodal.WavCodec.parse(aiff).isEmpty, "AIFF must not parse as WAV")
    val out = Multimodal.audioSpectral(
      Seq((1L, aiff, "audio/aiff")).toDF("media_id", "content", "mime"))
      .collect().head
    assert(out.n_window == 1024 && math.abs(out.spectral_centroid - 2000.0) < 1e-6,
      s"AIFF fallback broken: $out")
    // 4) fuzz: noise, truncations, corruptions never throw
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 500) {
      val junk = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(junk)
      graft.multimodal.WavCodec.parse(junk)
    }
    for (_ <- 0 until 500)
      graft.multimodal.WavCodec.parse(ours.take(rnd.nextInt(ours.length)))
    for (_ <- 0 until 500) {
      val mut = ours.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      graft.multimodal.WavCodec.parse(mut)
    }
  }

  test("audioSpectral: quarter-rate tone lands in band 2 at centroid rate/4; channel 0 of stereo") {
    import spark.implicits._
    // mono pure tone at rate/4 (the exactly-representable sinusoid):
    // all energy in band 2, centroid = rate/4 up to FFT twiddle noise
    def tone(n: Int, amp: Int, dc: Int): Array[Short] =
      Array.tabulate[Short](n)(i => (i % 4 match {
        case 1 => dc + amp
        case 3 => dc - amp
        case _ => dc
      }).toShort)
    val mono = Multimodal.encodeWavPcm16(8000, 1, tone(1024, 12000, 0))
    // stereo: tone on channel 0, constant junk on channel 1 — analysis
    // must read channel 0 only, giving the same features as mono
    val t = tone(1024, 12000, 0)
    val stereo = Multimodal.encodeWavPcm16(8000, 2,
      Array.tabulate[Short](2048)(i => if (i % 2 == 0) t(i / 2) else 999))
    val media = Seq(
      (1L, mono, "audio/wav"),
      (2L, stereo, "audio/wav"),
      (3L, "not audio".getBytes("UTF-8"), "audio/wav"),       // undecodable
      (4L, Multimodal.encodeWavPcm16(8000, 1, Array[Short](5)), "audio/wav")) // 1 sample
      .toDF("media_id", "content", "mime")
    val out = Multimodal.audioSpectral(media).collect().map(a => a.media_id -> a).toMap
    assert(out(1L).sample_rate == 8000 && out(1L).n_window == 1024)
    assert(math.abs(out(1L).spectral_centroid - 2000.0) < 1e-6)
    assert(out(1L).e_band2 > 1.0 - 1e-12 && out(1L).e_band0 < 1e-12)
    // stereo matches mono except for the junk channel's absence
    assert(out(2L).n_window == 1024 &&
      math.abs(out(2L).spectral_centroid - out(1L).spectral_centroid) < 1e-9)
    assert(out(3L) == Multimodal.AudioSpectral(3L, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(out(4L) == Multimodal.AudioSpectral(4L, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("sceneCuts: intensity-delta shot boundaries, scene ids, keyframes") {
    val frames = Seq(
      // video 1: two quiet shots and a final jump — cuts at idx 2 and 4
      (1L, 0, 0.10), (1L, 1, 0.12), (1L, 2, 0.80), (1L, 3, 0.81), (1L, 4, 0.20),
      // video 2: single frame — no cut, one scene, keyframe
      (2L, 0, 0.50),
      // video 3: monotone — one scene end to end
      (3L, 0, 0.40), (3L, 1, 0.42), (3L, 2, 0.44))
      .toDF("media_id", "frame_idx", "mean_px")
    val out = Multimodal.sceneCuts(frames, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getDouble(3), r.getBoolean(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out((1L, 0)) == ((0.0, false, 0L, true)))
    assert(!out((1L, 1))._2 && out((1L, 1))._3 == 0L && !out((1L, 1))._4)
    assert(out((1L, 2))._2 && out((1L, 2))._3 == 1L && out((1L, 2))._4)
    assert(!out((1L, 3))._2 && out((1L, 3))._3 == 1L)
    assert(out((1L, 4))._2 && out((1L, 4))._3 == 2L && out((1L, 4))._4)
    assert(math.abs(out((1L, 4))._1 - 0.61) < 1e-12)
    assert(out((2L, 0)) == ((0.0, false, 0L, true)))
    assert(Seq(0, 1, 2).forall(i => out((3L, i))._3 == 0L))
    assert(out((3L, 0))._4 && !out((3L, 1))._4 && !out((3L, 2))._4)
    // empty input → empty output, no window blowup
    assert(Multimodal.sceneCuts(frames.where($"media_id" < 0), 0.3).count() == 0)
  }

  test("energySegments: exact islands, threshold boundary, silence and corrupt yield none") {
    import spark.implicits._
    val fl = 4
    def wav(frames: Seq[Short]*): Array[Byte] =
      graft.multimodal.WavCodec.encodePcm16(8000, 1,
        frames.flatMap(f => Seq.fill(fl)(f.head)).toArray)
    // frame energy for constant amplitude A over 4 samples = 4*A^2
    val loud = Seq(100.toShort)   // 40000
    val silent = Seq(0.toShort)
    val media = Seq(
      Multimodal.MediaRecord(1L, wav(silent, loud, loud, silent, loud), "audio/wav"),
      Multimodal.MediaRecord(2L, wav(silent, silent), "audio/wav"),
      Multimodal.MediaRecord(3L, Array[Byte](9, 9), "audio/wav"),
      // boundary: energy == threshold is NOT active (strict >)
      Multimodal.MediaRecord(4L, wav(loud), "audio/wav")
    ).toDF()
    val segs = Multimodal.energySegments(media, fl, threshold = 39999L)
      .collect().map(s => (s.media_id, s.seg_idx, s.start_frame, s.end_frame)).toSet
    assert(segs == Set((1L, 0, 1L, 3L), (1L, 1, 4L, 5L), (4L, 0, 0L, 1L)))
    assert(Multimodal.energySegments(media, fl, threshold = 40000L)
      .where(col("media_id") === 4L).count() == 0)
  }

  test("channelStats: solid color exact, two-value variance exact, corrupt skipped") {
    import spark.implicits._
    val solid = Array.fill(6 * 4)((10 << 16) | (20 << 8) | 30)
    // r alternates 0/2 -> mean255 1.0, var255 1.0, std 1/255
    val alt = Array.tabulate(6 * 4)(i => ((if (i % 2 == 0) 0 else 2) << 16))
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.encodeImage("png", 6, 4, solid), "image/png"),
      Multimodal.MediaRecord(2L, Multimodal.encodeImage("png", 6, 4, alt), "image/png"),
      Multimodal.MediaRecord(3L, Array[Byte](1, 2, 3), "image/png"),
      Multimodal.MediaRecord(4L, Multimodal.encodeImage("png", 6, 4, solid), "text/plain")
    ).toDF()
    val out = Multimodal.channelStats(media).collect().map(c => c.media_id -> c).toMap
    assert(out.keySet == Set(1L, 2L))
    val c1 = out(1L)
    assert((c1.width, c1.height) == ((6, 4)))
    assert(c1.mean_r == 10.0 / 255.0 && c1.mean_g == 20.0 / 255.0 && c1.mean_b == 30.0 / 255.0)
    assert(c1.std_r == 0.0 && c1.std_g == 0.0 && c1.std_b == 0.0)
    val c2 = out(2L)
    assert(c2.mean_r == 1.0 / 255.0 && c2.std_r == 1.0 / 255.0)
    assert(c2.mean_g == 0.0 && c2.std_g == 0.0)
  }
}
