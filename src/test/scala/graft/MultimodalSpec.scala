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
}
