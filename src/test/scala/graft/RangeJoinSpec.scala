package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.RangeJoin

/** Randomized equivalence: the banded interval join must agree with the
  * brute-force cross-product filter on arbitrary points/intervals —
  * including intervals spanning multiple bands, empty intervals, and
  * points exactly on band or interval boundaries. */
object RangeJoinProps extends Properties("RangeJoin") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val pointsGen = Gen.nonEmptyListOf(Gen.choose(-20L, 40L))
  private val intervalsGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(-20L, 40L), Gen.choose(0L, 25L)).map { case (s, len) => (s, s + len) })

  property("pointInInterval == brute-force containment, each match exactly once") =
    Prop.forAll(pointsGen, intervalsGen, Gen.oneOf(1L, 7L, 100L)) { (ps, ivs, width) =>
      val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iid", "s", "e")
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", width)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toList.sorted
      val want = (for {
        (p, pi) <- ps.zipWithIndex
        ((s, e), ii) <- ivs.zipWithIndex
        if p >= s && p < e
      } yield (pi.toLong, ii.toLong)).sorted
      Prop(got == want) :| s"got=$got want=$want width=$width"
    }

  property("intervalOverlap == brute-force intersection, each pair exactly once") =
    Prop.forAll(intervalsGen, intervalsGen, Gen.oneOf(1L, 7L, 100L)) { (ls, rs, width) =>
      val left = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("lid", "ls", "le")
      val right = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("rid", "rs", "re")
      val got = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re", width)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toList.sorted
      // true-intersection semantics: [max(s), min(e)) nonempty — a
      // zero-length [s, s) is an empty set and overlaps NOTHING (the
      // bare `s1 < e2 && s2 < e1` would wrongly admit it)
      val want = (for {
        ((s1, e1), li) <- ls.zipWithIndex
        ((s2, e2), ri) <- rs.zipWithIndex
        if math.max(s1, s2) < math.min(e1, e2)
      } yield (li.toLong, ri.toLong)).sorted
      Prop(got == want) :| s"got=$got want=$want width=$width"
    }
}
