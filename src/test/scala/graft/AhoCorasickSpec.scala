package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Curation

/** Aho-Corasick multi-pattern matcher ([[graft.functions.MultiPatternHits]])
  * + the blocklist face. The reference is the naive all-start-positions
  * substring count — the semantics the t30 oracle replicates in SQL. */
class AhoCorasickSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveCount(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  private def run(texts: Seq[String], pats: Seq[String]): Seq[(String, Long, String)] =
    Curation.blocklistTag(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", pats)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3))).toSeq

  test("classic dictionary {he, she, his, hers} on 'ushers': 3 overlapping hits") {
    val Seq((_, hits, terms)) = run(Seq("ushers"), Seq("he", "she", "his", "hers"))
    assert(hits == 3L)
    assert(terms == "he hers she")
  }

  test("self-overlapping pattern counts every start position: 'aa' in 'aaaa' = 3") {
    val Seq((_, hits, terms)) = run(Seq("aaaa"), Seq("aa"))
    assert(hits == 3L && terms == "aa")
  }

  test("no match: zero hits, empty terms, flag false; empty text survives") {
    val out = Curation.blocklistTag(
      Seq((0L, ""), (1L, "clean text")).toDF("doc_id", "text"), "text", Seq("zzz"))
      .collect().map(r => (r.getLong(2), r.getString(3), r.getBoolean(4)))
    assert(out.forall { case (h, t, f) => h == 0L && t == "" && !f })
  }

  test("randomized equivalence vs the naive count, small alphabet (dense overlaps)") {
    val rnd = new scala.util.Random(7)
    val pats = Seq("ab", "aba", "bab", "aa", "b", "abab")
    val texts = Seq.fill(200)((0 until (1 + rnd.nextInt(30)))
      .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
    val got = run(texts, pats)
    for ((text, out) <- texts.zip(got)) {
      val expHits = pats.map(naiveCount(text, _)).sum
      val expTerms = pats.filter(naiveCount(text, _) > 0).sorted.mkString(" ")
      assert(out._2 == expHits, s"hits for '$text'")
      assert(out._3 == expTerms, s"terms for '$text'")
    }
  }

  test("multi-word phrases cross token boundaries; non-ASCII patterns match") {
    val Seq((_, h1, t1), (_, h2, t2)) =
      run(Seq("the quick brown fox", "naïve café naïve"), Seq("quick brown", "naïve"))
    assert(h1 == 1L && t1 == "quick brown")
    assert(h2 == 2L && t2 == "naïve")
  }

  test("duplicate or empty patterns are rejected loudly") {
    intercept[IllegalArgumentException] {
      graft.functions.TextExpressionFunctions.multiPatternHits(col("x"), Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      graft.functions.TextExpressionFunctions.multiPatternHits(col("x"), Seq(""))
    }
  }
}
