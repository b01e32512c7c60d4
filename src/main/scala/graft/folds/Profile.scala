package graft.folds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, DataType, NumericType, StringType, TimestampType}

/** Schema-driven data profiling — the `foldAllConstrained` pattern
  * (SURVEY §2.3.2) applied to the pipeline-monitoring use case: one wide
  * row of per-column statistics from ONE aggregation pass (single shuffle,
  * map-side partial aggregation).
  *
  * Per profiled column: `<c>_count` (non-null), `<c>_distinct`,
  * `<c>_min` / `<c>_max` (native type), plus a global `n_rows`.
  *
  * `exactDistinct = true` uses `count_distinct` — Catalyst rewrites
  * multiple distinct aggregates via Expand (rows × #distinct-aggs before
  * the shuffle), fine at audit scale and required for an external oracle.
  * At 100 TB profiling runs, set it false: `approx_count_distinct` (HLL++)
  * keeps the pass Expand-free with mergeable sketch state.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    def orderable(t: DataType): Boolean = t match {
      case _: NumericType | StringType | BooleanType | DateType | TimestampType => true
      case _ => false
    }
    cols.foreach(c => require(orderable(df.schema(c).dataType),
      s"profile: column $c is not an orderable scalar type"))
    def nd(c: Column): Column =
      if (exactDistinct) count_distinct(c) else approx_count_distinct(c)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_count"),
      nd(col(c)).as(s"${c}_distinct"),
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max")))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
