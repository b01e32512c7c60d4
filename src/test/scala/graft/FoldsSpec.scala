package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.folds.{Aggregators, Folds, NamedAgg}
import graft.mapreduce.{Assign, MapReduce, Reduce, Unpack}

/** Fold-algebra specs (reference `Frames.Folds`; SURVEY §2.3.2) including
  * the reference's one deterministic golden test and the distributed-fold
  * laws (partition invariance = Aggregator merge correctness). */
class FoldsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reference golden fixture: null-skipping sums (AddRowsByLabel.hs:122-131,146-155)") {
    // rows one..four with "NaN"/"lol" parse failures -> null cells
    val rows = Seq[(String, java.lang.Double, java.lang.Double)](
      ("A", 1.0, 2.0), ("Z", null, 3.0), ("A", 4.0, null), ("Z", 5.0, 6.0)
    ).toDF("label", "x", "y")
    val out = MapReduce(rows, Unpack.NoOp, Assign.SplitOnKeys(Seq("label")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("x", sum(col("x"))), NamedAgg("y", sum(col("y"))))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // golden: {A, x 5.0, y 2.0}, {Z, x 5.0, y 9.0}
    assert(out == Set(("A", 5.0, 2.0), ("Z", 5.0, 9.0)))
  }

  test("foldAllNumeric aggregates exactly the numeric columns (Folds.hs:219-225)") {
    val df = Seq(("A", 1L, 2.0, true)).toDF("s", "l", "d", "b")
    val aggs = Folds.foldAllNumeric(df.schema, sum, exclude = Nil)
    assert(aggs.map(_.name) == Seq("l", "d"))
  }

  test("sequenceRecFold: multi-agg is one pass / one Aggregate node (Folds.hs:149-154)") {
    val df = Seq(("A", 1.0), ("A", 3.0)).toDF("k", "v")
    val out = MapReduce(df, Unpack.NoOp, Assign.SplitOnKeys(Seq("k")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("s", sum(col("v"))), NamedAgg("m", max(col("v"))),
        Folds.recFieldF("s2", sum, col("v") * col("v")))))
    val plan = out.queryExecution.optimizedPlan.toString()
    assert(plan.linesIterator.count(_.trim.startsWith("Aggregate")) == 1)
    assert(out.collect().head.toSeq.tail == Seq(4.0, 3.0, 10.0))
  }

  test("Aggregator folds are partition-invariant (monoid merge law, Folds.hs:230-249)") {
    val data = (1 to 100).map(i => (i % 7, i.toDouble, (i % 3 + 1).toDouble))
    def run(parts: Int) = {
      val df = data.toDF("k", "x", "w").repartition(parts)
      val wm = Aggregators.asColumn(Aggregators.weightedMean, col("x"), col("w"))(
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      df.groupBy("k").agg(wm.as("wm")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    val one = run(1)
    val many = run(13)
    assert(one.keySet == many.keySet)
    one.foreach { case (k, v) => assert(math.abs(v - many(k)) < 1e-9) }
  }

  test("topK aggregator == window row_number top-k, and is partition-invariant") {
    val data = (1 to 200).map(i => (i % 5, (i % 23).toDouble, i.toLong))
    def run(parts: Int) = {
      val df = data.toDF("k", "score", "id").repartition(parts)
      val top = Aggregators.asColumn(Aggregators.topK(4), col("score"), col("id"))(
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      df.groupBy("k").agg(top.as("top")).collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getLong(1)))).toMap
    }
    val one = run(1)
    val many = run(13)
    assert(one == many, "top-k not merge-invariant")
    // reference: brute-force per-group sort
    val want = data.groupBy(_._1).map { case (k, rows) =>
      k -> rows.map(r => (r._2, r._3)).sortBy { case (s, id) => (-s, id) }.take(4).toSeq
    }
    assert(one == want)
  }

  test("Aggregator weighted mean == native sum(x*w)/sum(w) (SURVEY §7.2)") {
    val df = Seq((1, 2.0, 1.0), (1, 4.0, 3.0)).toDF("k", "x", "w")
    val wm = Aggregators.asColumn(Aggregators.weightedMean, col("x"), col("w"))(
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    val both = df.groupBy("k").agg(
      wm.as("agg"), (sum(col("x") * col("w")) / sum(col("w"))).as("native")).collect().head
    assert(math.abs(both.getDouble(1) - both.getDouble(2)) < 1e-12)
  }

  test("nullPoisoningSum: any null poisons the group (Folds/General.hs:260-273 semantics)") {
    val df = Seq[(String, java.lang.Double)](
      ("A", 1.0), ("A", null), ("B", 2.0), ("B", 3.0)).toDF("k", "v")
    val ps = Aggregators.asColumn(Aggregators.nullPoisoningSum, col("v"))(Encoders.DOUBLE)
    val out = df.groupBy("k").agg(ps.as("s")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("A").isEmpty)
    assert(out("B").contains(5.0))
  }

  test("skipNulls lifts a fold over nullable input (filteredFold, Folds/General.hs:110-112)") {
    val agg = Aggregators.skipNulls(Aggregators.monoidFold[java.lang.Double](
      0.0, (a, b) => java.lang.Double.valueOf(a + b))(Encoders.DOUBLE))
    val df = Seq[(String, java.lang.Double)](("A", 1.0), ("A", null), ("A", 2.0)).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(Aggregators.asColumn(agg, col("v"))(Encoders.DOUBLE).as("s")).collect().head
    assert(out.getDouble(1) == 3.0)
  }

  test("foldFrame: global aggregate without grouping") {
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val out = Folds.foldFrame(df, Seq(NamedAgg("s", sum(col("v"))), NamedAgg("n", count(lit(1)))))
    assert(out.collect().head.toSeq == Seq(6.0, 3L))
  }

  test("HLL sketches: union of partial sketches equals the whole-data sketch; estimate near exact") {
    // the mergeability law behind sketch-at-rest pre-aggregation: build
    // per-group sketches, union later, never rescan
    val df = spark.range(20000).selectExpr("id % 7 AS g", "concat('tok', id % 2500) AS tok")
    df.createOrReplaceTempView("hll_t")
    val unioned = spark.sql(
      """SELECT hll_sketch_estimate(hll_union_agg(s)) FROM
           (SELECT g, hll_sketch_agg(tok) AS s FROM hll_t GROUP BY g)""")
      .collect().head.getLong(0)
    val direct = spark.sql("SELECT hll_sketch_estimate(hll_sketch_agg(tok)) FROM hll_t")
      .collect().head.getLong(0)
    assert(unioned == direct, "sketch union must be exactly order/partition-insensitive")
    val exact = 2500.0
    assert(math.abs(unioned - exact) / exact < 0.05, s"estimate $unioned vs exact $exact")
  }

  test("KLL quantiles: per-key estimates within the rank-error bound; n exact") {
    // uniform 0..9999 per key → true quantile at rank r is ~ r*10000.
    // KLL k=200 guarantees ~1.65% rank error (99% conf); assert 3%.
    val df = spark.range(20000).selectExpr("id % 2 AS g", "(id / 2) AS v")
    val out = graft.folds.KllQuantiles.quantilesByKey(df, "g", "v", Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("0", "1"))
    for ((_, (n, p50, p95)) <- out) {
      assert(n == 10000L, "sketch n is exact, not estimated")
      assert(math.abs(p50 - 5000.0) < 300.0, s"p50=$p50 outside rank-error bound")
      assert(math.abs(p95 - 9500.0) < 300.0, s"p95=$p95 outside rank-error bound")
    }
  }

  test("KLL column names: fractional percents embed the rank; duplicate names rejected") {
    val df = spark.range(100).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
    val cols = graft.folds.KllQuantiles
      .quantilesByKey(df, "g", "v", Seq(0.005, 0.01, 0.5, 0.995, 1.0)).columns.toSeq
    // 0.005 and 0.01 used to both round to q_1; 0.995 and 1.0 both to q_100
    assert(cols == Seq("g", "n", "q_0_005", "q_1", "q_50", "q_0_995", "q_100"))
    intercept[IllegalArgumentException] {
      graft.folds.KllQuantiles.quantilesByKey(df, "g", "v", Seq(0.5, 0.5))
    }
  }

  test("KLL merge law: merged partition partials give the same guarantee as one pass") {
    // estimates aren't bit-reproducible (compaction flips coins) — the
    // merge LAW is that the merged sketch keeps n exact and the rank
    // guarantee, whatever the partitioning
    val df = spark.range(10000).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
    for (parts <- Seq(1, 7)) {
      val out = graft.folds.KllQuantiles
        .quantilesByKey(df.repartition(parts), "g", "v", Seq(0.5))
        .collect().head
      assert(out.getLong(1) == 10000L)
      assert(math.abs(out.getDouble(2) - 5000.0) < 300.0)
    }
  }
}
