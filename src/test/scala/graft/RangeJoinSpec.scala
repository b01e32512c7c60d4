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
}
