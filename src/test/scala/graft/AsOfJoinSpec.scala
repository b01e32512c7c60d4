package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, "A", 5L),   // before any right row -> nulls
    (2L, "A", 10L),  // exactly at r1 -> r1 (inclusive)
    (3L, "A", 25L),  // after r2/r3 tie -> max tiebreak wins
    (4L, "B", 100L), // other key
    (5L, "C", 50L)   // key with no right rows -> nulls
  ).toDF("event_id", "k", "t")

  private def right = Seq(
    ("A", 10L, 100L, 1.0), ("A", 20L, 200L, 2.0), ("A", 20L, 201L, 3.0),
    ("B", 90L, 300L, 9.0)
  ).toDF("rk", "rt", "ref_id", "v")

  test("backward as-of: latest right row at or before left time, inclusive, tie-broken") {
    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
      rightPayload = Seq("ref_id", "v"), rightTieBreak = Seq("ref_id"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) == (None, None))
    assert(out(2L) == (Some(100L), Some(1.0)))
    assert(out(3L) == (Some(201L), Some(3.0))) // tie at rt=20: max ref_id wins
    assert(out(4L) == (Some(300L), Some(9.0))) // B@100 sees B@90
    assert(out(5L) == (None, None))
  }

  test("backward as-of matches within key boundaries only") {
    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
      rightPayload = Seq("ref_id"), rightTieBreak = Seq("ref_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(4L) == Some(300L)) // B@100 sees B@90
    assert(out(5L).isEmpty)       // C has no right rows
  }

  test("collision and empty-payload validation") {
    assertThrows[IllegalArgumentException] {
      AsOfJoin.backward(left, right, "k", "rk", "t", "rt", rightPayload = Nil)
    }
    assertThrows[IllegalArgumentException] {
      AsOfJoin.backward(left, right.withColumnRenamed("ref_id", "k"),
        "k", "rk", "t", "rt", rightPayload = Seq("k"))
    }
  }
}
