package graft.folds

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch (Cormode & Muthukrishnan 2005, via Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch`) as sketch-at-rest
  * point-frequency estimation — the fourth face of the mergeable-summary
  * family (a2 HLL: distinct counts; a3 KLL: quantiles; t13 Space-Saving:
  * heavy hitters; a4 CMS: "how often did THIS item occur"). Space-Saving
  * answers "what are the top items"; CMS answers arbitrary point queries
  * it never saw coming, in depth×width counters, with a one-sided
  * guarantee: est ≥ true, est ≤ true + εN at confidence 1−δ.
  *
  * Same shape as [[KllQuantiles]]: one sketch OBJECT per (partition, key)
  * inside `mapPartitions` (no per-row serde tax), then a monoid fold of
  * serialized partials — only sketches cross the shuffle, never the item
  * stream.
  *
  * Unlike KLL/HLL, CMS is LINEAR: counters just add, so partial-merge ≡
  * whole-data sketch BIT-FOR-BIT, and with a fixed seed estimates are
  * fully deterministic — which makes the a4 query oracle-able against
  * exact counts in the no-collision regime (width ≫ distinct items; the
  * spec additionally pins the overestimate bound when collisions do
  * happen). */
object CmsFrequency {

  /** Serialized per-(partition, key) CMS partials over string items:
    * (key, cms). */
  def partialsByKey(
      df: DataFrame, keyCol: String, itemCol: String,
      depth: Int, width: Int, seed: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(itemCol).cast("string"))
      .where(col(itemCol).isNotNull)
      .as[(String, String)]
      .mapPartitions { rows =>
        val sketches = scala.collection.mutable.HashMap.empty[String, CountMinSketch]
        rows.foreach { case (key, item) =>
          sketches.getOrElseUpdate(key, CountMinSketch.create(depth, width, seed))
            .addString(item)
        }
        sketches.iterator.map { case (key, sk) => (key, toBytes(sk)) }
      }
      .toDF(keyCol, "cms")
  }

  private def toBytes(sk: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    sk.writeTo(out)
    out.toByteArray
  }

  private def fromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** CMS merge is counter addition — associative, commutative, and EXACT
    * (merged partials ≡ the sketch of the concatenated stream, bitwise).
    * Runs over the tiny partials relation only. */
  def mergeAggregator: org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] =
    Aggregators.monoidFold[Array[Byte]](Array.emptyByteArray, (a, b) =>
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val m = fromBytes(a)
        m.mergeInPlace(fromBytes(b))
        toBytes(m)
      })(Encoders.BINARY)

  /** Point-frequency estimate for one string item. */
  def estimate(bytes: Array[Byte], item: String): Long =
    fromBytes(bytes).estimateCount(item)

  /** End-to-end: per-key CMS, probed at `probes` → (key, item, est).
    * The probe list is a driver-side artifact (the point of CMS is that
    * probes need NOT be known at build time — the sketch at rest answers
    * any later question). One narrow pass + one shuffle of sketch rows. */
  def frequenciesByKey(
      df: DataFrame, keyCol: String, itemCol: String, probes: Seq[String],
      depth: Int = 5, width: Int = 256, seed: Int = 42): DataFrame = {
    require(probes.nonEmpty, "frequenciesByKey: need at least one probe item")
    val spark = df.sparkSession
    import spark.implicits._
    val merge = udaf(mergeAggregator, Encoders.BINARY)
    val est = udf((bytes: Array[Byte], item: String) => estimate(bytes, item))
    partialsByKey(df, keyCol, itemCol, depth, width, seed)
      .groupBy(col(keyCol))
      .agg(merge(col("cms")).as("__sk"))
      .crossJoin(broadcast(probes.toDF(itemCol)))
      .select(col(keyCol), col(itemCol),
        est(col("__sk"), col(itemCol)).as("est"))
  }
}
