package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-column clustering so that
  * range/point predicates on ANY of the layout columns skip most files and
  * row groups at rest. The 100 TB story: partitioning prunes on ONE
  * dimension; a linear sort clusters ONE dimension; bit-interleaving the
  * dimensions gives every layout column locality at once, so parquet
  * min/max stats (file- and row-group-level) skip for each of them. This
  * is the public Morton-order technique (Morton 1966; used by Delta
  * OPTIMIZE ZORDER BY, Iceberg sort orders, Databricks/AWS docs) —
  * implemented here as a pure Column expression plus a range-partitioned
  * sorted sink, nothing engine-specific.
  *
  * Two pieces:
  *   - [[ZOrder.interleaveBits]]: the Morton code itself — a pure integer
  *     Column expression (shift/mask/or), codegen-friendly, oracle-able in
  *     ANSI SQL (exercised by `x21_zorder_interleave`).
  *   - [[ZOrder.writeZOrdered]]: equi-width bucketize each layout column
  *     to `bits` bits (min/max via a broadcast 1-row cross join — no
  *     driver action), Morton-code the buckets, then
  *     `repartitionByRange(zval)` + `sortWithinPartitions(zval)` +
  *     parquet. Files tile the curve, so each file's per-column min/max
  *     spans ~1/2^(bits per file dim) of each dimension instead of the
  *     whole domain.
  *
  * Equi-width bucketing is deliberate: it is deterministic, shuffle-free,
  * and stays inside whole-stage codegen. Under heavy value skew an
  * equi-depth variant (approx_percentile boundaries through the same
  * broadcast join) balances the curve better; that swap is a boundary
  * table, not a layout change, and is documented rather than defaulted
  * because the uniform case covers the common telemetry/id layout.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of each column (already
    * non-negative longs). Bit `i` of column `j` lands at position
    * `i * k + j` (k = number of columns), so the result has `k * bits`
    * bits — keep `k * bits <= 62`. Built from shift/mask/sum (the summed
    * terms occupy disjoint bits, so + is OR), which folds into one
    * codegen'd integer expression with no UDF and has an exact ANSI SQL
    * analog for the oracle. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "ZOrder.interleaveBits: need at least one column")
    require(bits > 0 && cols.size * bits <= 62,
      s"ZOrder.interleaveBits: k*bits must be in [1, 62], got ${cols.size * bits}")
    val k = cols.size
    val terms =
      for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
        shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Equi-width bucket of `c` into [0, 2^bits) given inclusive min/max
    * columns (degenerate min==max domain → bucket 0). Null policy: a null
    * value — or an all-null column whose min/max are null — buckets to 0,
    * NOT to n-1: `least` skips nulls, so without the coalesce a null floor
    * would silently land in the TOP bucket and cluster null-heavy columns
    * at one end of the curve. Layout-only either way (no row is dropped),
    * but bucket 0 keeps the null cluster where a reader expects it. */
  private[graft] def bucket(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val n = 1L << bits
    val span = maxC - minC
    // the coalesce must wrap the FLOOR, not the whole expression: least()
    // SKIPS nulls, so least(null, n-1) = n-1 and an outer coalesce never
    // sees a null — the exact no-op fix a review round caught live
    when(span <= lit(0.0), lit(0L))
      .otherwise(least(
        coalesce(
          floor((c.cast("double") - minC) / (span + lit(1e-12)) * n).cast("long"),
          lit(0L)),
        lit(n - 1)))
  }

  /** Write `df` parquet, physically clustered on the Morton curve over
    * `zCols`. Per-column min/max arrive via a broadcast 1-row cross join
    * (the t8 lesson: no eager driver-side action at plan build). The
    * range repartition gives ~`numFiles` files tiling consecutive curve
    * segments; the within-partition sort tightens row-group stats too.
    * The helper returns the bucketized frame (with `__zval`) for callers
    * that want the curve position without writing. */
  def zOrderFrame(df: DataFrame, zCols: Seq[String], bits: Int = 8): DataFrame = {
    require(zCols.nonEmpty, "ZOrder: need at least one layout column")
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val buckets = zCols.map(c =>
      bucket(col(c), col(s"__min_$c"), col(s"__max_$c"), bits))
    withStats
      .withColumn("__zval", interleaveBits(buckets, bits))
      .drop(zCols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  def writeZOrdered(
      df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 8, numFiles: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    zOrderFrame(df, zCols, bits)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")
      .write.mode(mode).parquet(path)
}
