package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.PageRank

/** Randomized equivalence of the DataFrame PageRank against a plain-Scala
  * power iteration on arbitrary small graphs (self-loops, multi-edges,
  * sinks, disconnected components all arise from the generator), plus
  * rank-mass conservation. Graphs stay tiny — property rounds dominate
  * Spark job time otherwise (NOTES). */
object PageRankProps extends Properties("PageRank") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edgeGen = for {
    s <- Gen.choose(0L, 8L)
    t <- Gen.choose(0L, 8L)
  } yield (s, t)
  private val graphGen = Gen.nonEmptyListOf(edgeGen).map(_.take(14))

  private def reference(
      edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      val dm = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  property("matches the local power iteration on arbitrary graphs") =
    forAll(graphGen, Gen.choose(0, 3)) { (edges, iters) =>
      val got = PageRank.run(edges.toDF("s", "t"), "s", "t", iters = iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      CacheRegistry.unpersistAll()
      val want = reference(edges, iters, 0.85)
      got.keySet == want.keySet &&
        want.forall { case (k, v) => math.abs(got(k) - v) < 1e-9 }
    }

  property("rank mass is conserved (sums to 1)") =
    forAll(graphGen) { edges =>
      val total = PageRank.run(edges.toDF("s", "t"), "s", "t", iters = 2)
        .collect().map(_.getDouble(1)).sum
      CacheRegistry.unpersistAll()
      math.abs(total - 1.0) < 1e-6
    }
}
