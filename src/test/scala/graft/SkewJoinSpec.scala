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
}
