package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reconcile

/** Snapshot diff semantics: added/removed/changed/unchanged statuses,
  * per-column change attribution, and null-safe comparison (null→value
  * is a change, null→null is not). */
class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val before = Seq(
    (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
    (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
    .toDF("id", "name", "v")

  private val after = Seq(
    (1L, Some("a"), 10.0),                 // unchanged
    (2L, Some("b2"), 25.0),                // changed: name AND v
    (3L, None: Option[String], 30.0),      // unchanged (null <=> null)
    (5L, None: Option[String], 50.0))      // added; 4 removed
    .toDF("id", "name", "v")

  test("detail: statuses and changed-column attribution") {
    val d = Reconcile.detail(before, after, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2))).toMap
    assert(d(1L) == ("unchanged", Seq()))
    assert(d(2L) == ("changed", Seq("name", "v")))
    assert(d(3L) == ("unchanged", Seq()), "null <=> null must not count as a change")
    assert(d(4L) == ("removed", Seq()))
    assert(d(5L) == ("added", Seq()))
  }

  test("null-to-value transition counts as a change") {
    val a2 = Seq((3L, Some("now"), 30.0)).toDF("id", "name", "v")
    val d = Reconcile.detail(before.where($"id" === 3L), a2, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2))).toMap
    assert(d(3L) == ("changed", Seq("name")))
  }

  test("summary: counts per status with bounded example keys; mismatched schema rejected") {
    val s = Reconcile.summary(before, after, Seq("id"), nExamples = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](2))).toMap
    assert(s("unchanged") == (2L, Seq("1", "3")))
    assert(s("changed") == (1L, Seq("2")))
    assert(s("removed") == (1L, Seq("4")))
    assert(s("added") == (1L, Seq("5")))
    intercept[IllegalArgumentException](
      Reconcile.detail(before, after.drop("v"), Seq("id")))
  }

  test("null key components pair up (null-safe key join), never spurious added+removed") {
    val b = Seq((Some(1L), "x", 1.0), (None: Option[Long], "y", 2.0)).toDF("id", "name", "v")
    val a = Seq((Some(1L), "x", 1.0), (None: Option[Long], "y", 9.0)).toDF("id", "name", "v")
    val d = Reconcile.detail(b, a, Seq("id"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        (r.getString(1), r.getSeq[String](2))).toMap
    assert(d(Some(1L)) == ("unchanged", Seq()))
    assert(d(None) == ("changed", Seq("v")), "null key must join to itself, not split")
  }
}
