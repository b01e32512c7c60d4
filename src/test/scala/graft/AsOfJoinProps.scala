package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.AsOfJoin

/** Randomized equivalence: the distributed as-of join must agree with a
  * per-row brute-force reference on arbitrary data (keys, times, ties). */
object AsOfJoinProps extends Properties("AsOfJoin") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val keyGen = Gen.oneOf("A", "B", "C")
  private val leftGen = Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.choose(0L, 30L)))
  private val rightGen = Gen.nonEmptyListOf(
    Gen.zip(keyGen, Gen.choose(0L, 30L), Gen.choose(0L, 99L)))

  property("backward as-of == brute-force latest-at-or-before with max-ref tie-break") =
    Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rs.toDF("rk", "rt", "ref")
      val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
        rightPayload = Seq("ref"), rightTieBreak = Seq("ref"))
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val matches = rs.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (matches.isEmpty) None
                     else Some(matches.map(r => (r._2, r._3)).max._2))
      }.toMap
      got == want
    }

  property("forward as-of == brute-force earliest-at-or-after") =
    Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rs.toDF("rk", "rt", "ref")
      val got = AsOfJoin.forward(left, right, "k", "rk", "t", "rt",
        rightPayload = Seq("ref"), rightTieBreak = Seq("ref"))
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val matches = rs.filter(r => r._1 == k && r._2 >= t)
        // earliest time; ties → max ref (same rule as backward)
        i.toLong -> (if (matches.isEmpty) None
                     else Some(matches.map(r => (-r._2, r._3)).max._2))
      }.toMap
      got == want
    }

  property("nearest as-of == brute force closest-in-time with backward tie rule") =
    Prop.forAll(leftGen, rightGen, Gen.option(Gen.choose(0L, 10L))) { (ls, rs, tol) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rs.toDF("rk", "rt", "ref")
      val got = AsOfJoin.nearest(left, right, "k", "rk", "t", "rt",
        rightPayload = Seq("ref"), rightTieBreak = Seq("ref"),
        tolerance = tol.map(_.toDouble))
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        def ok(gap: Long) = tol.forall(gap <= _)
        val back = rs.filter(r => r._1 == k && r._2 <= t && ok(t - r._2))
          .sortBy(r => (r._2, r._3)).lastOption           // latest time, max ref
        val fwd = rs.filter(r => r._1 == k && r._2 > t && ok(r._2 - t))
          .sortBy(r => (r._2, r._3)).headOption           // earliest time, min ref
        val chosen = (back, fwd) match {
          case (Some(b), Some(f)) => if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f)             => b.orElse(f)
        }
        i.toLong -> chosen.map(_._3)
      }.toMap
      Prop(got == want) :| s"got=$got want=$want tol=$tol"
    }

  // Nanosecond-epoch regression: ~1.7e18 exceeds double's 53-bit mantissa,
  // so a double sort key merges adjacent nano timestamps (±1..1024 ns all
  // round to the same double) and the carry-forward picks the wrong row.
  // The native long key must keep them distinct.
  property("backward as-of is exact on nanosecond-epoch longs beyond 2^53") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(-512L, 512L)),
      Gen.nonEmptyListOf(Gen.choose(-512L, 512L))) { (lOffs, rOffs) =>
      val base = 1700000000000000000L // ≈ 2026 in epoch nanos, ≫ 2^53
      val left = lOffs.zipWithIndex.map { case (o, i) => (i.toLong, "K", base + o) }
        .toDF("event_id", "k", "t")
      val right = rOffs.zipWithIndex.map { case (o, i) => ("K", base + o, i.toLong) }
        .toDF("rk", "rt", "ref")
      val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
        rightPayload = Seq("ref"), rightTieBreak = Seq("ref"))
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val want = lOffs.zipWithIndex.map { case (o, i) =>
        val matches = rOffs.zipWithIndex.filter { case (ro, _) => ro <= o }
        i.toLong -> (if (matches.isEmpty) None
                     else Some(matches.map { case (ro, ri) => (ro, ri.toLong) }.max._2))
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("backward as-of with tolerance == brute force filtered by gap") =
    Prop.forAll(leftGen, rightGen, Gen.choose(0L, 10L)) { (ls, rs, tol) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rs.toDF("rk", "rt", "ref")
      val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
        rightPayload = Seq("ref"), rightTieBreak = Seq("ref"),
        tolerance = Some(tol.toDouble))
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val matches = rs.filter(r => r._1 == k && r._2 <= t && t - r._2 <= tol)
        i.toLong -> (if (matches.isEmpty) None
                     else Some(matches.map(r => (r._2, r._3)).max._2))
      }.toMap
      got == want
    }
}
