package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.text.Curation

/** Randomized equivalence of the distributed DSIR weights against a
  * plain-Scala replication of the formula (own md5, own tokenizer) on
  * arbitrary small corpora with arbitrary target subsets. */
object DsirProps extends Properties("Dsir") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 32
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "zeta", "eta")
  private val docGen = Gen.choose(1, 6).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpusGen = for {
    texts <- Gen.nonEmptyListOf(docGen).map(_.take(8))
    targetMask <- Gen.listOfN(texts.size, Gen.oneOf(true, false))
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    targetMask)

  private def feats(text: String): Seq[String] = {
    val ws = text.split(" ", -1).toSeq
    ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }
  private def bucket(f: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % dims
  }
  private def reference(
      raw: Seq[(Long, String)], target: Seq[String]): Map[Long, Double] = {
    def counts(texts: Seq[String]): Map[Long, Long] =
      texts.flatMap(feats).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (rc, tc) = (counts(raw.map(_._2)), counts(target))
    val (rt, tt) = (rc.values.sum, tc.values.sum)
    def lp(c: Map[Long, Long], tot: Long)(b: Long): Double =
      math.log((c.getOrElse(b, 0L) + 1).toDouble / (tot + dims).toDouble)
    raw.map { case (id, t) =>
      id -> feats(t).groupBy(bucket).map { case (b, fs) =>
        fs.size * (lp(tc, tt)(b) - lp(rc, rt)(b))
      }.sum
    }.toMap
  }

  property("weights match the local formula on arbitrary corpora and targets") =
    forAll(corpusGen) { case (corpus, mask) =>
      val targetIds = corpus.zip(mask).collect { case ((id, _), true) => id }.toSet
      val raw = corpus.toDF("doc_id", "text")
      val target = raw.where(col("doc_id").isin(targetIds.toSeq.map(Long.box): _*))
      val got = Curation.dsirWeights(raw, target, "doc_id", "text", dims = dims)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      CacheRegistry.unpersistAll()
      val want = reference(corpus, corpus.collect {
        case (id, t) if targetIds(id) => t
      })
      got.keySet == want.keySet &&
        want.forall { case (id, w) => math.abs(got(id) - w) < 1e-9 }
    }
}
