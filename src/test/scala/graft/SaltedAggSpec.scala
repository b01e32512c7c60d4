package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedAgg

class SaltedAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key ("a": 100 rows, 10 distinct values) + a cold key
  private lazy val skewed = ((0 until 100).map(i => ("a", (i % 10).toLong, i.toDouble)) ++
    Seq(("b", 1L, 1.0), ("b", 2L, 2.0))).toDF("k", "v", "x")

  test("distinctAgg is exact and salt-count invariant") {
    val expected = skewed.groupBy("k")
      .agg(countDistinct("v").as("nd"), sum("x").as("sx"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for (buckets <- Seq(1, 7, 32)) {
      val got = SaltedAgg.distinctAgg(skewed, Seq("k"), "v", buckets, "nd",
        companions = Seq(SaltedAgg.Sum("x", "sx")))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet == expected.keySet, s"buckets=$buckets")
      got.foreach { case (k, (nd, sx)) =>
        assert(nd == expected(k)._1, s"buckets=$buckets key=$k distinct")
        assert(math.abs(sx - expected(k)._2) < 1e-9, s"buckets=$buckets key=$k sum")
      }
    }
  }

  test("groupByAgg matches plain groupBy for all algebraic aggregates") {
    val expected = skewed.groupBy("k").agg(
      sum("x").as("s"), count(lit(1)).as("c"), min("x").as("mn"),
      max("x").as("mx"), avg("x").as("av"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val got = SaltedAgg.groupByAgg(skewed, Seq("k"), 8, Seq(
      SaltedAgg.Sum("x", "s"), SaltedAgg.Count("c"), SaltedAgg.Min("x", "mn"),
      SaltedAgg.Max("x", "mx"), SaltedAgg.Avg("x", "av")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (s, c, mn, mx, av)) =>
      val (es, ec, emn, emx, eav) = expected(k)
      assert(math.abs(s - es) < 1e-9 && c == ec && mn == emn && mx == emx &&
        math.abs(av - eav) < 1e-9, s"key=$k")
    }
  }

  test("distinctAgg plan has no Expand and two aggregate stages") {
    val plan = SaltedAgg.distinctAgg(skewed, Seq("k"), "v", 8, "nd")
      .queryExecution.executedPlan.toString
    // the point of salting: per-bucket count_distinct stays a hash aggregate
    // pipeline; the hot key's state is split across buckets
    assert(plan.contains("HashAggregate"))
  }
}
