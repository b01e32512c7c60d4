package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

class CanonicalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonicalize: chains and triangles collapse to min id; clusters stay separate") {
    // cluster {1,2,3} via chain 1-2, 2-3; cluster {10,11,12} via triangle;
    // cluster {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val labels = Dedup.canonicalize(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("dropNearDuplicates keeps canonical members and untouched rows") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (9L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }
}
