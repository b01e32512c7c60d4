package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.folds.Aggregators

/** Randomized Space-Saving guarantees, distributed: for arbitrary skewed
  * streams and arbitrary partitionings, every reported (count, err)
  * brackets the true frequency, items above n/capacity are never lost,
  * and the exact regime (capacity ≥ distinct) reproduces true counts. */
object SpaceSavingProps extends Properties("SpaceSaving") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // Zipf-ish: few heavy items, long tail of rare ones
  private val streamGen: Gen[List[String]] = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.const("h1"), 5 -> Gen.const("h2"),
    3 -> Gen.oneOf("m1", "m2", "m3"),
    2 -> Gen.choose(1, 25).map(i => s"r$i")))
  private val partsGen = Gen.choose(1, 7)

  private def sketch(items: Seq[String], cap: Int, parts: Int) = {
    val agg = Aggregators.asColumn(
      Aggregators.spaceSaving(cap, cap), col("item"))(Encoders.STRING)
    items.toDF("item").repartition(parts)
      .groupBy(lit(1)).agg(agg.as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1"), col("e._2"), col("e._3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  property("count-err <= true <= count; heavy survivors; exact when cap >= distinct") =
    Prop.forAll(streamGen, Gen.choose(3, 8), partsGen) { (items, cap, parts) =>
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val out = sketch(items, cap, parts)
      val bounds = out.forall { case (item, c, err) =>
        val t = truth(item)
        t <= c && c - err <= t
      }
      val reported = out.map(_._1).toSet
      // 2n/cap not n/cap: the absent-key-contributes-min merge rule can
      // inflate counts by up to n/cap per merge level (partial + final)
      val survivors = truth.forall { case (item, t) =>
        t <= 2L * items.size / cap || reported.contains(item)
      }
      val exact =
        if (cap >= truth.size)
          out.map(e => e._1 -> e._2).toMap == truth && out.forall(_._3 == 0L)
        else true
      bounds && survivors && exact
    }
}
