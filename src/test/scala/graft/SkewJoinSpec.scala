package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** Salted-join semantics: the salt changes the partitioning, never the
  * result — equality against the plain join under skew, many-to-many
  * multiplicities, and any salt count. Plan shape is pinned in PlanSpec. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // hot key 7 carries half the probe rows; build side is many-to-many on
  // key 7 (two payload rows); key 9 has no build match (its rows drop)
  private lazy val probe = ((1 to 50).map(i => (7L, i)) ++
    (1 to 50).map(i => (i.toLong % 9, 100 + i)) :+ ((9L, 999))).toDF("k", "pv")
  private lazy val build = ((0L to 8L).map(k => (k, s"b$k")) :+ (7L, "b7x"))
    .toDF("k", "bv")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, String)] =
    df.select("k", "pv", "bv").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted

  test("salted join equals plain join under skew and many-to-many keys") {
    val plain = canon(probe.join(build, "k"))
    assert(plain.nonEmpty && plain.size > probe.count()) // m2m actually exercised
    for (n <- Seq(1, 3, 8))
      assert(canon(SkewJoin.salted(probe, build, Seq("k"), n)) == plain,
        s"salted($n) diverged from the plain join")
  }

  test("salted join drops probe rows with no build match, like the plain inner join") {
    val out = SkewJoin.salted(probe, build.where(col("k") =!= 7L), Seq("k"), 4)
    assert(!canon(out).exists(_._1 == 7L))
  }

  test("identical probe rows stay correct under the content-hash fallback") {
    // worst case for the content-hash fallback: the probe is ONLY the hot
    // join key, every row identical — all 64 rows land on one salt (the
    // documented degenerate case). Correctness must be unaffected: the
    // join keeps multiplicity (64 copies × 2 build matches).
    val hot = Seq.fill(64)(Tuple1(7L)).toDF("k").repartition(2)
    val out = SkewJoin.salted(hot, build, Seq("k"), 4)
    assert(out.count() == 64L * 2)
    assert(out.select("bv").distinct().collect().map(_.getString(0)).toSet ==
      Set("b7", "b7x"))
  }

  test("saltFrom id column spreads identical probe rows across all salts") {
    // same degenerate probe, but the caller supplies a unique id — the
    // recommended shape. Every salt value must be covered (no straggler)
    // AND the salt must be deterministic: recomputing the same rows gives
    // the same salt (retry safety — contrast monotonically_increasing_id,
    // whose value depends on row position within a partition).
    val hot = (0 until 64).map(i => (7L, i)).toDF("k", "id").repartition(2)
    val saltCol = pmod(hash(col("id")), lit(4)) // mirrors salted()'s internal salt
    val salts = hot.withColumn("__salt", saltCol)
      .select("__salt").distinct().collect().map(_.getInt(0)).toSet
    assert(salts == Set(0, 1, 2, 3), s"expected all 4 salts covered, got $salts")
    // deterministic across recomputation: two independent evaluations agree
    val a = hot.withColumn("__salt", saltCol).collect()
      .map(r => (r.getInt(1), r.getInt(2))).toMap
    val b = hot.withColumn("__salt", saltCol).collect()
      .map(r => (r.getInt(1), r.getInt(2))).toMap
    assert(a == b, "salt must not depend on evaluation order")
    val out = SkewJoin.salted(hot, build, Seq("k"), 4,
      saltFrom = Some(col("id")))
    assert(out.count() == 64L * 2)
    assert(out.select("bv").distinct().collect().map(_.getString(0)).toSet ==
      Set("b7", "b7x"))
  }
}
