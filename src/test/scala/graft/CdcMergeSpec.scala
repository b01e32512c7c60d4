package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcMerge

/** MERGE INTO semantics: deletes vanish, upserts replace wholesale,
  * inserts append, untouched rows pass through unchanged. */
class CdcMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("delete removes, upsert replaces, insert appends, rest untouched") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val changes = Seq(
      (2L, "b2", 25.0, CdcMerge.Upsert),  // update
      (3L, "c", 30.0, CdcMerge.Delete),   // delete
      (4L, "d", 40.0, CdcMerge.Upsert))   // insert
      .toDF("id", "name", "v", "op")
    val out = CdcMerge(snap, changes, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
  }

  test("an unknown op value raises instead of silently deleting the row") {
    val snap = Seq((1L, "a")).toDF("id", "name")
    val bad = Seq((1L, "a2", "update")).toDF("id", "name", "op") // not 'upsert'
    val e = intercept[Exception](CdcMerge(snap, bad, Seq("id")).collect())
    assert(e.getMessage.contains("CdcMerge") || e.getCause != null)
  }

  test("empty changeset is the identity; schema mismatch is rejected eagerly") {
    val snap = Seq((1L, "a")).toDF("id", "name")
    val none = Seq.empty[(Long, String, String)].toDF("id", "name", "op")
    assert(CdcMerge(snap, none, Seq("id")).collect().toSeq
      == snap.collect().toSeq)
    val bad = Seq((1L, CdcMerge.Upsert)).toDF("id", "op") // missing 'name'
    val e = intercept[IllegalArgumentException](CdcMerge(snap, bad, Seq("id")))
    assert(e.getMessage.contains("snapshot schema"))
  }
}
