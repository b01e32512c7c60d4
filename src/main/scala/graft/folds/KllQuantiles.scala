package graft.folds

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** KLL quantile sketches (Karnin, Lang, Liberty 2016 — via Apache
  * DataSketches) as sketch-at-rest pre-aggregation: the mergeable
  * streaming-quantiles structure that replaces exact `percentile` (a
  * per-group sort of every row, t5) at 100 TB with one bounded-memory
  * pass. k=200 gives ~1.65 % rank error at 99 % confidence regardless of
  * n — the same contract as the a2 HLL path, for quantiles instead of
  * distinct counts.
  *
  * Shape: [[partialsByKey]] builds ONE sketch object per (partition, key)
  * inside `mapPartitions` — the sketch lives across the partition's rows,
  * so there is no per-row serialize/heapify tax (an `Aggregator` with a
  * byte-array buffer would pay exactly that on every `reduce` call) —
  * then emits the serialized partials, at most (#partitions × #keys)
  * tiny rows. [[quantilesByKey]] merges the partials per key with a
  * monoid fold ([[Aggregators.monoidFold]] — KLL merge is the monoid the
  * reference derives folds from) and extracts quantile estimates. The
  * full-size value stream crosses NO shuffle; only sketches do. Partials
  * can also be persisted as a parquet column and re-merged later —
  * sketch-at-rest, the point of mergeability.
  *
  * Determinism: KLL compaction flips coins (that's how it keeps the rank
  * guarantee distribution-free), so estimates are NOT bit-reproducible
  * run to run — like s4's k-means this is rows-only territory; the spec
  * pins the rank-error bound and the merge law instead of bits.
  */
object KllQuantiles {

  /** Serialized per-(partition, key) KLL partial sketches: (key, sketch).
    * Keys are strings (cast yours); per-partition key fan-out is assumed
    * modest (group-by-able dimensions, not ids) — a million-key stratum
    * would make the partial relation itself the aggregate, which is fine
    * too: it merges down in the next step. */
  def partialsByKey(
      df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      // null values carry no rank information and would NPE the typed
      // encoder (non-nullable Double field) — skip them, like every
      // built-in aggregate does
      .where(col(valueCol).isNotNull)
      .as[(String, Double)]
      .mapPartitions { rows =>
        val sketches = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        rows.foreach { case (key, v) =>
          sketches.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        sketches.iterator.map { case (key, sk) => (key, sk.toByteArray) }
      }
      .toDF(keyCol, "kll")
  }

  /** KLL merge as the monoid it is: empty ⟂ bytes, merge via the sketch's
    * own `merge` (associative, commutative — Agarwal et al., "Mergeable
    * Summaries"). Runs over the tiny partials relation only. */
  def mergeAggregator(k: Int): org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] =
    Aggregators.monoidFold[Array[Byte]](Array.emptyByteArray, (a, b) =>
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val m = KllDoublesSketch.newHeapInstance(k)
        m.merge(KllDoublesSketch.heapify(Memory.wrap(a)))
        m.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
        m.toByteArray
      })(Encoders.BINARY)

  /** Extract (n, quantile estimates at `ranks`) from a serialized sketch. */
  def estimate(bytes: Array[Byte], ranks: Seq[Double]): (Long, Seq[Double]) = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    (sk.getN, ranks.map(r => sk.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)))
  }

  /** End-to-end per-key quantile estimates: (key, n, q_<rank>...). One
    * narrow pass over the data, one shuffle of sketch rows, quantile
    * extraction on the merged sketch per key. */
  def quantilesByKey(
      df: DataFrame, keyCol: String, valueCol: String,
      ranks: Seq[Double], k: Int = 200): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
      "quantilesByKey: ranks must be in [0,1]")
    val spark = df.sparkSession
    val merge = udaf(mergeAggregator(k), Encoders.BINARY)
    val est = udf((bytes: Array[Byte]) => estimate(bytes, ranks))
    // Integral percents keep the friendly q_50 form; fractional percents
    // embed the full rank (0.995 -> q_0_995) so distinct ranks can never
    // collapse onto one column name (0.005 and 0.01 both rounded to q_1).
    val names = ranks.map { r =>
      val pct = BigDecimal(r.toString) * 100
      if (pct.isWhole) s"q_${pct.toBigInt}"
      else "q_" + BigDecimal(r.toString).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_")
    }
    require(names.distinct.size == names.size,
      s"quantilesByKey: ranks must be distinct, got column names $names")
    val qNames = names.zipWithIndex.map { case (n, i) =>
      col("__est._2").getItem(i).as(n)
    }
    partialsByKey(df, keyCol, valueCol, k)
      .groupBy(col(keyCol))
      .agg(merge(col("kll")).as("__sk"))
      .withColumn("__est", est(col("__sk")))
      .select(col(keyCol) +: col("__est._1").as("n") +: qNames: _*)
  }
}
