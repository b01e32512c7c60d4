package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.dedup.Dedup

/** Randomized equivalence: the distributed SimHash pipeline (explode →
  * one vote aggregation → pigeonhole block equi-join → hamming filter)
  * must agree with a direct single-machine all-pairs replication of the
  * same algorithm — md5-hex feature hashes, per-bit ±1 votes, hamming
  * bound. The local side deliberately uses NO blocking: with complete
  * pigeonhole candidate generation, the blocked distributed result must
  * equal the unblocked truth (the old single-prefix-block scheme fails
  * this property — it missed pairs differing in the prefix). */
object SimhashProps extends Properties("Simhash") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val bits = 32
  private val maxHamming = 3
  private val shingleN = 3

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val docGen = Gen.chooseNum(3, 9).flatMap(n => Gen.listOfN(n, wordGen))
  private val corpusGen = Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, docGen))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Exact Scala replica of the Spark pipeline's fingerprint. */
  private def fingerprint(words: List[String]): Long = {
    val shingles = words.sliding(shingleN).map(_.mkString(" ")).toList.distinct
    val hashes = shingles.map(md5hex)
    (1 to bits).map { i =>
      val votes = hashes.map(h => if ("89abcdef".contains(h(i - 1))) 1 else -1).sum
      if (votes > 0) 1L << (i - 1) else 0L
    }.sum
  }

  property("simhashPairs == single-machine replication of the same algorithm") =
    Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.simhashPairs(df, "doc_id", "text", shingleN, bits, maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
      val fps = docs.zipWithIndex.collect {
        case (ws, i) if ws.length >= shingleN => (i.toLong, fingerprint(ws))
      }
      val want = (for {
        (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
        h = java.lang.Long.bitCount(fa ^ fb)
        if h <= maxHamming
      } yield (ia, ib, h)).toSet
      Prop(got == want) :| s"got=$got want=$want"
    }
}
