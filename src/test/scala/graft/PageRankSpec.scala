package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** PageRank semantics against an independent in-memory power iteration:
  * exact agreement (to the operator's 9 dp output rounding) on graphs
  * with cycles, dangling sinks, and duplicate edges; rank conservation. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference: same algebra, no Spark. */
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

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val out = PageRank.run(edges.toDF("s", "t"), "s", "t", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheRegistry.unpersistAll()
    out
  }

  // a cycle (1→2→3→1), a feeder (4→1), and a pure sink (3→5): exercises
  // contributions, zero-indegree nodes, and dangling-mass redistribution
  private val graph = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (3L, 5L))

  test("matches an independent power iteration on a mixed graph") {
    for (iters <- Seq(0, 1, 3, 10)) {
      val got = run(graph, iters)
      val want = reference(graph, iters, 0.85)
      assert(got.keySet == want.keySet)
      for ((k, v) <- want)
        assert(math.abs(got(k) - v) < 1e-9, s"node $k at iters=$iters")
    }
  }

  test("duplicate edges collapse to the simple graph") {
    assert(run(graph ++ graph, 3) == run(graph, 3))
  }

  test("ranks sum to 1 (teleport + dangling redistribution conserve mass)") {
    val total = run(graph, 5).values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"ranks sum to $total")
  }

  test("bipartite graph where every destination is a sink") {
    // the x34 shape: all mass flows to sinks, then the full dangling
    // mass redistributes each iteration
    val bipartite = Seq((1L, 10L), (2L, 20L))
    val got = run(bipartite, 4)
    val want = reference(bipartite, 4, 0.85)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"node $k")
  }
}
