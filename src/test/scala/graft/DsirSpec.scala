package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Curation

/** DSIR importance weights against an independent plain-Scala replication
  * of the formula (own md5, own tokenizer), plus the semantic contract:
  * target-like documents outscore off-target ones. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 64

  // Spark's split(text, " ") keeps trailing empties (limit -1)
  private def feats(text: String): Seq[String] = {
    val ws = text.split(" ", -1).toSeq
    ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def bucket(f: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % dims
  }

  private def refWeights(
      raw: Seq[(Long, String)], target: Seq[String]): Map[Long, Double] = {
    def counts(texts: Seq[String]): Map[Long, Long] =
      texts.flatMap(feats).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val rc = counts(raw.map(_._2))
    val tc = counts(target)
    val (rt, tt) = (rc.values.sum, tc.values.sum)
    def lp(c: Map[Long, Long], tot: Long)(b: Long): Double =
      math.log((c.getOrElse(b, 0L) + 1).toDouble / (tot + dims).toDouble)
    raw.map { case (id, t) =>
      id -> feats(t).groupBy(bucket).map { case (b, fs) =>
        fs.size * (lp(tc, tt)(b) - lp(rc, rt)(b))
      }.sum
    }.toMap
  }

  private val corpus = Seq(
    (1L, "alpha beta gamma alpha beta"),
    (2L, "alpha beta delta beta alpha"),
    (3L, "zeta eta theta zeta eta"),
    (4L, "alpha eta gamma zeta beta"),
    (5L, "beta alpha gamma"))
  // target domain: the alpha/beta dialect
  private val targetIds = Set(1L, 2L, 5L)

  private def run(): Map[Long, (Double, Boolean)] = {
    val raw = corpus.toDF("doc_id", "text")
    val out = Curation.dsirWeights(
        raw, raw.where(col("doc_id").isin(targetIds.toSeq: _*)),
        "doc_id", "text", dims = dims)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    CacheRegistry.unpersistAll()
    out
  }

  test("matches the independent formula replication to the 9 dp rounding") {
    val got = run()
    val want = refWeights(corpus, corpus.filter(c => targetIds(c._1)).map(_._2))
    assert(got.keySet == want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id)._1 - w) < 1e-9, s"doc $id: got ${got(id)._1}, want $w")
  }

  test("target-dialect documents outscore off-target ones; keep = weight > 0") {
    val got = run()
    val inW = targetIds.map(got(_)._1)
    val outW = got(3L)._1
    assert(inW.forall(_ > outW), s"target weights $inW vs off-target $outW")
    for ((_, (w, keep)) <- got) assert(keep == (w > 0.0))
  }

  test("predicate overload ≡ two-relation form, bit-for-bit (r14 single-pass opt)") {
    val raw = corpus.toDF("doc_id", "text")
    val pred = col("doc_id").isin(targetIds.toSeq: _*)
    val twoRel = Curation.dsirWeights(raw, raw.where(pred), "doc_id", "text", dims = dims)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    CacheRegistry.unpersistAll()
    val onePass = Curation.dsirWeights(raw, pred, "doc_id", "text", dims)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    CacheRegistry.unpersistAll()
    // exact equality, not tolerance: both forms sum the same integer counts
    // into the same IEEE expressions, so the doubles must be identical
    assert(onePass == twoRel)
  }

  test("disjoint-vocabulary target drives every non-target weight negative") {
    val raw = corpus.toDF("doc_id", "text")
    val out = Curation.dsirWeights(raw, raw.where(col("doc_id") === 3L),
        "doc_id", "text", dims = dims)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheRegistry.unpersistAll()
    assert(out(3L) > 0.0)
    assert(Seq(1L, 2L, 5L).forall(out(_) < 0.0))
  }
}
