package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.aggregation.Aggregation
import graft.folds.NamedAgg

/** Key-recoding aggregation specs (reference `Frames.Aggregation`;
  * SURVEY §2.4). */
class AggregationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("A", 10, 1.0), ("B", 20, 2.0), ("C", 30, 3.0), ("A", 40, 4.0)
  ).toDF("label", "age", "v")

  test("keyMap + aggregateAllFold: recode keys, merge groups (Aggregation.hs:109-121)") {
    val recode = Aggregation.keyMap("label", "grp")(c =>
      when(c.isin("A", "B"), "AorB").otherwise("Other"))
    val out = Aggregation.aggregateAllFold(
      df.select("label", "v"), recode, Seq(NamedAgg("s", sum(col("v")))))
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("AorB", 7.0), ("Other", 3.0)))
  }

  test("combineKeyAggregations: product of disjoint recoders (Aggregation.hs:68-74)") {
    val r1 = Aggregation.keyMap("label", "grp")(c => when(c === "A", "a").otherwise("rest"))
    val r2 = Aggregation.keyMap("age", "band")(c => when(c < 25, "young").otherwise("old"))
    val combined = Aggregation.combineKeyAggregations(r1, r2)
    assert(combined.consumed == Seq("label", "age"))
    assert(combined.producedNames == Seq("grp", "band"))
    val out = Aggregation.aggregateAllFold(df, combined, Seq(NamedAgg("n", count(lit(1)))))
    assert(out.count() == 4) // (a,young) (rest,young) (rest,old) (a,old)
  }

  test("combineKeyAggregations rejects overlapping column sets (Disjoint constraint)") {
    val r1 = Aggregation.keyMap("label", "grp")(identity)
    val r2 = Aggregation.keyMap("label", "grp2")(identity)
    assertThrows[IllegalArgumentException] {
      Aggregation.combineKeyAggregations(r1, r2)
    }
  }

  test("aggregateFold holds constant keys fixed (Aggregation.hs:130-136), ONE flat groupBy") {
    val recode = Aggregation.keyMap("age", "band")(c => when(c < 25, "young").otherwise("old"))
    val out = Aggregation.aggregateFold(df, Seq("label"), recode, Seq(NamedAgg("s", sum(col("v")))))
    assert(out.columns.toSeq == Seq("label", "band", "s"))
    assert(out.collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap ==
      Map(("A", "young") -> 1.0, ("B", "young") -> 2.0, ("C", "old") -> 3.0, ("A", "old") -> 4.0))
    // flat plan: exactly one Aggregate (the reference's nested grouping is
    // an artifact we intentionally do NOT replicate, SURVEY §2.4)
    val plan = out.queryExecution.optimizedPlan.toString()
    assert(plan.linesIterator.count(_.trim.startsWith("Aggregate")) == 1)
  }
}
