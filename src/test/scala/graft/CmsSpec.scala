package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.folds.CmsFrequency

/** Count-min sketch: linearity (partition-merged ≡ exact counts in the
  * wide regime), the one-sided overestimate guarantee when the sketch is
  * squeezed, and partition invariance of the merge. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val items =
    Seq.tabulate(500)(i => ("k" + (i % 2), "item" + (i % 25))) // 250 each key, items repeat

  test("wide regime: estimates equal exact counts, zero-count probes return 0") {
    val df = items.toDF("key", "item").repartition(7)
    val probes = Seq("item0", "item13", "item24", "never_seen")
    val got = CmsFrequency.frequenciesByKey(df, "key", "item", probes,
      depth = 5, width = 512, seed = 1)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val exact = items.groupBy(identity).map { case ((k, i), xs) => (k, i) -> xs.size.toLong }
    probes.foreach { p =>
      Seq("k0", "k1").foreach { k =>
        assert(got((k, p)) == exact.getOrElse((k, p), 0L),
          s"($k, $p): est ${got((k, p))} != exact ${exact.getOrElse((k, p), 0L)}")
      }
    }
  }

  test("squeezed sketch: estimate never underestimates, respects eps*N bound shape") {
    val df = items.toDF("key", "item")
    // width 4 << 25 distinct items: collisions guaranteed
    val got = CmsFrequency.frequenciesByKey(df, "key", "item",
      (0 until 25).map("item" + _), depth = 3, width = 4, seed = 7)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val exact = items.groupBy(identity).map { case ((k, i), xs) => (k, i) -> xs.size.toLong }
    exact.foreach { case (kp, n) =>
      assert(got(kp) >= n, s"$kp underestimated: ${got(kp)} < $n")
      assert(got(kp) <= 250L, s"$kp exceeds stream length: ${got(kp)}")
    }
  }

  test("merge is partition-invariant (linear counters: any split, same sketch)") {
    val probes = Seq("item3", "item17")
    def run(parts: Int) =
      CmsFrequency.frequenciesByKey(items.toDF("key", "item").repartition(parts),
        "key", "item", probes, depth = 4, width = 16, seed = 3)
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(run(1) == run(13))
  }
}
