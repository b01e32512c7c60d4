package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Curation

/** compressionRatio laws (the query is rows-only — deflate byte counts
  * are zlib-implementation-defined, so the oracle is these invariants
  * plus an in-JVM replication with the same java.util.zip). */
class CompressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (Double, Long, Long)] =
    Curation.compressionRatio(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def localDeflate(text: String): Long = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(text.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  private val repetitive = "spam ham " * 400
  private val diverse = (1 to 400).map(i => (i * 2654435761L).toHexString).mkString(" ")

  test("repetitive text compresses far better than diverse text") {
    val out = run(Seq((1L, repetitive), (2L, diverse)))
    assert(out(1L)._1 < 0.05, s"boilerplate ratio ${out(1L)._1}")
    assert(out(2L)._1 > 0.5, s"diverse ratio ${out(2L)._1}")
  }

  test("byte accounting matches an in-JVM deflate of the same input") {
    val out = run(Seq((1L, repetitive), (2L, diverse), (3L, "héllo wörld")))
    for ((id, text) <- Seq((1L, repetitive), (2L, diverse), (3L, "héllo wörld"))) {
      val (ratio, raw, defl) = out(id)
      assert(raw == text.getBytes("UTF-8").length.toLong, s"doc $id raw bytes")
      assert(defl == localDeflate(text), s"doc $id deflate bytes")
      assert(ratio == defl.toDouble / raw, s"doc $id ratio")
    }
  }

  test("degenerate inputs: empty text finite, nulls dropped, deterministic") {
    val out = run(Seq((1L, ""), (2L, "x")))
    assert(out(1L)._1 > 0.0 && !out(1L)._1.isInfinite) // clamped denominator
    assert(run(Seq((1L, ""), (2L, "x"))) == out)
    val withNull = Seq((1L, Some("a")), (2L, None)).map { case (i, t) => (i, t.orNull) }
    assert(run(withNull).keySet == Set(1L))
  }
}
