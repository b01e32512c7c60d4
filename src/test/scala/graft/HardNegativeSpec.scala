package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity

/** Hard-negative mining: label-mismatch filtering on top of the exact
  * top-k contract (cosine desc, id asc ties), against a local reference. */
class HardNegativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, 0, Array(0.99f, 0.1f, 0.0f, 0.0f)), // same label as anchor 0: excluded
    (2L, 1, Array(0.9f, 0.2f, 0.0f, 0.0f)),  // the hardest negative
    (3L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, 2, Array(0.7f, 0.7f, 0.0f, 0.0f)),
    (5L, 2, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "label", "embedding")

  private def localRef(anchor: Array[Float], label: Int, k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    Seq((1L, 0, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, 1, Array(0.9f, 0.2f, 0.0f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, 2, Array(0.7f, 0.7f, 0.0f, 0.0f)),
      (5L, 2, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
      .filter(_._2 != label)
      .map { case (id, _, v) => (id, cos(anchor, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k).map(_._1)
  }

  test("negatives exclude the anchor's own label and rank by cosine") {
    val anchors = vecs.where(col("vec_id") === 0L)
    val out = Similarity.hardNegativeTopK(vecs, anchors,
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
    assert(out.forall(_.getLong(0) == 0L))
    val got = out.map(_.getLong(1)).toSeq
    assert(got == localRef(Array(1.0f, 0.0f, 0.0f, 0.0f), 0, 3), s"got $got")
    assert(!got.contains(1L), "same-label vector leaked into the negatives")
  }

  test("every anchor gets negatives; none of them share the anchor's label") {
    val out = Similarity.hardNegativeTopK(vecs, vecs,
      "vec_id", "embedding", "label", k = 2)
    val labels = vecs.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).distinct.length == 6)
    assert(rows.forall { case (q, n) => labels(q) != labels(n) })
  }
}
