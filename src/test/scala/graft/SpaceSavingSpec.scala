package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.folds.Aggregators

class SpaceSavingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(items: Seq[String], capacity: Int, topN: Int, parts: Int) = {
    val agg = Aggregators.asColumn(
      Aggregators.spaceSaving(capacity, topN), col("item"))(Encoders.STRING)
    items.toDF("item").repartition(parts)
      .groupBy(lit(1)).agg(agg.as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("c"), col("e._3").as("err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  private val stream =
    Seq.fill(50)("heavy") ++ Seq.fill(20)("mid") ++
      (1 to 15).flatMap(i => Seq.fill(2)(s"rare$i"))

  test("exact regime: capacity >= distinct gives true counts, err 0, any partitioning") {
    for (parts <- Seq(1, 7)) {
      val out = run(stream, capacity = 32, topN = 32, parts)
        .map(e => e._1 -> ((e._2, e._3))).toMap // 17 distinct
      assert(out.size == 17)
      assert(out("heavy") == ((50L, 0L)))
      assert(out("mid") == ((20L, 0L)))
      (1 to 15).foreach(i => assert(out(s"rare$i") == ((2L, 0L))))
    }
  }

  test("trim regime: overestimate bound holds and heavy items survive") {
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 5)) {
      val out = run(stream, capacity = 4, topN = 4, parts)
      // n/capacity = 100/4 = 25: 'heavy' (50) MUST be present
      val items = out.map(_._1).toSet
      assert(items.contains("heavy"))
      // count - err <= true <= count for every reported item
      out.foreach { case (item, c, err) =>
        val t = truth(item)
        assert(c >= t, s"$item: count $c underestimates true $t")
        assert(c - err <= t, s"$item: count-err ${c - err} exceeds true $t")
      }
    }
  }

  test("topN cuts by (count desc, item asc)") {
    val out = run(stream, capacity = 32, topN = 2, parts = 3)
    assert(out.map(_._1).toSeq == Seq("heavy", "mid"))
  }

  test("count ties at the topN boundary cut in code-point order (astral items)") {
    // "😀" (U+1F600) vs "": UTF-16 order puts the emoji FIRST
    // (high surrogate 0xD83D < 0xE000), code-point order puts it LAST.
    // The oracle's ORDER BY (DuckDB/Spark UTF-8 collation) is
    // code-point order, so  must win the boundary tie.
    val smile = new String(Character.toChars(0x1F600))
    val items = Seq.fill(5)("top") ++ Seq.fill(2)(smile) ++ Seq.fill(2)("")
    for (parts <- Seq(1, 3)) {
      val out = run(items, capacity = 8, topN = 2, parts)
      assert(out.map(_._1).toSeq == Seq("top", ""),
        s"boundary tie must cut in code-point order, got ${out.map(_._1).toSeq}")
    }
  }
}
