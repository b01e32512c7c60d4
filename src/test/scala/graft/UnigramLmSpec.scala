package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.UnigramLm

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "the merge the merge sort",
    "merge sort the table scan",
    "scan the table the merge",
    "sort merge join the scan scan")

  test("distributed training == serial reference, on any partitioning") {
    val words = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val local = UnigramLm.trainLocal(words, vocabSize = 12,
      seedSize = 50, maxPieceLen = 4)
    for (parts <- Seq(1, 7)) {
      val dist = UnigramLm.train(
        corpus.toDF("text").repartition(parts), "text", vocabSize = 12,
        seedSize = 50, maxPieceLen = 4)
      assert(dist == local, s"diverged at $parts partitions")
    }
    // vocab respects the target modulo the always-kept single characters
    val chars = local.map(_.piece).filter(_.length == 1).toSet
    assert(local.size <= 12 + chars.size)
    // probabilities normalize
    assert(math.abs(local.map(_.prob).sum - 1.0) < 1e-12)
    // ranked by (count desc, piece asc)
    assert(local == local.sortBy(p => (-p.count, p.piece)))
  }

  test("viterbi: picks the higher-likelihood split; ties prefer fewer pieces") {
    val logp = Map("ab" -> math.log(0.4), "a" -> math.log(0.3),
      "b" -> math.log(0.2), "c" -> math.log(0.1))
    // "ab" as one piece (0.4) beats a+b (0.06)
    assert(UnigramLm.viterbi("ab", logp, 4) == List("ab"))
    assert(UnigramLm.viterbi("abc", logp, 4) == List("ab", "c"))
    // OOV char: single-char floor fallback keeps segmentation total
    assert(UnigramLm.viterbi("axb", logp, 4) == List("a", "x", "b"))
    assert(UnigramLm.viterbi("", logp, 4) == Nil)
    // exact tie on logp: "aa" with p(aa)=p(a)^2 -> fewer pieces wins
    val tie = Map("aa" -> math.log(0.25), "a" -> math.log(0.5))
    assert(math.log(0.25) == 2 * math.log(0.5) ||
      UnigramLm.viterbi("aa", tie, 4).nonEmpty) // guard: only assert rule if IEEE tie holds
    if (math.log(0.25) == 2 * math.log(0.5))
      assert(UnigramLm.viterbi("aa", tie, 4) == List("aa"))
  }

  test("encode: pieces concatenate back to the words; OOV text survives") {
    val model = UnigramLm.trainLocal(
      Seq(("merge", 4L), ("sort", 3L), ("scan", 2L)), vocabSize = 10,
      seedSize = 50, maxPieceLen = 4)
    val docs = Seq((1L, "merge sort"), (2L, "scan"), (3L, ""), (4L, "zzz merge"))
      .toDF("doc_id", "text")
    val out = UnigramLm.encode(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // reassembling pieces (drop the separators) must reproduce the words
    for ((id, (_, pieces)) <- out) {
      val orig = docs.where(col("doc_id") === id).head().getString(1)
      assert(pieces.replace(" ", "") == orig.replace(" ", ""), s"doc $id")
    }
    assert(out(3L) == ((0L, "")))
    assert(out(4L)._1 >= 4L) // zzz falls back to single chars
  }
}
