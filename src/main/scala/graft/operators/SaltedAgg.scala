package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage ("salted") aggregation.
  *
  * When a grouping key is heavily skewed, the FINAL aggregation of all rows
  * of the hot key lands on one task. For *algebraic* aggregates (sum, count,
  * min, max, avg) Spark's map-side partial aggregation already bounds that:
  * each map task emits one partial row per key, so the hot key's final task
  * merges #tasks rows, not #rows. The case where salting is load-bearing is
  * *holistic* per-key state — exact distinct counts, collect_set — where the
  * final task would otherwise build one giant hash set for the hot key.
  *
  * [[distinctAgg]] salts by a hash of the VALUE, so every distinct value
  * lands in exactly one (key, salt) bucket: per-bucket distinct counts are
  * disjoint and their sum is the exact global distinct count. State per
  * task shrinks by the salt factor; both shuffles are on (key, salt) which
  * is uniform in the salt dimension by construction.
  *
  * [[groupByAgg]] is the textbook two-stage form for algebraic aggregates
  * (salt from a row hash) — provided for completeness and for engines/paths
  * without partial aggregation (e.g. after a `mapGroups` fence).
  */
object SaltedAgg {

  sealed trait Alg { def out: String }
  final case class Sum(in: String, out: String) extends Alg
  final case class Count(out: String) extends Alg
  final case class Min(in: String, out: String) extends Alg
  final case class Max(in: String, out: String) extends Alg
  final case class Avg(in: String, out: String) extends Alg

  /** Exact per-key distinct count of `valueCol` (plus optional algebraic
    * companions) in two uniform shuffles. The salt is `hash(value) mod
    * saltBuckets`: distinct values partition cleanly across buckets, so
    * `sum` of per-bucket `count_distinct` is exact. */
  def distinctAgg(
      df: DataFrame, keys: Seq[String], valueCol: String, saltBuckets: Int,
      distinctOut: String, companions: Seq[Alg] = Nil): DataFrame = {
    require(saltBuckets >= 1, "distinctAgg: saltBuckets must be >= 1")
    val salt = pmod(hash(col(valueCol)), lit(saltBuckets)).as("__salt")
    val stage1 = count_distinct(col(valueCol)).as(s"__pd") +: companions.flatMap(partial)
    val stage2 = sum(col("__pd")).as(distinctOut) +: companions.map(merge)
    df.groupBy(keys.map(col) :+ salt: _*)
      .agg(stage1.head, stage1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(stage2.head, stage2.tail: _*)
  }

  /** Two-stage salted aggregation for algebraic aggregates; salt is a row
    * hash so rows of a hot key spread across `saltBuckets` stage-1 groups. */
  def groupByAgg(
      df: DataFrame, keys: Seq[String], saltBuckets: Int, aggs: Seq[Alg]): DataFrame = {
    require(saltBuckets >= 1, "groupByAgg: saltBuckets must be >= 1")
    require(aggs.nonEmpty, "groupByAgg: need at least one aggregate")
    val salt = pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)).as("__salt")
    val stage1 = aggs.flatMap(partial)
    val stage2 = aggs.map(merge)
    df.groupBy(keys.map(col) :+ salt: _*)
      .agg(stage1.head, stage1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(stage2.head, stage2.tail: _*)
  }

  private def partial(a: Alg): Seq[Column] = a match {
    case Sum(in, out) => Seq(sum(col(in)).as(s"__p0_$out"))
    case Count(out)   => Seq(count(lit(1)).as(s"__p0_$out"))
    case Min(in, out) => Seq(min(col(in)).as(s"__p0_$out"))
    case Max(in, out) => Seq(max(col(in)).as(s"__p0_$out"))
    case Avg(in, out) => Seq(sum(col(in)).as(s"__p0_$out"), count(col(in)).as(s"__p1_$out"))
  }

  private def merge(a: Alg): Column = a match {
    case Sum(_, out) => sum(col(s"__p0_$out")).as(out)
    case Count(out)  => sum(col(s"__p0_$out")).as(out)
    case Min(_, out) => min(col(s"__p0_$out")).as(out)
    case Max(_, out) => max(col(s"__p0_$out")).as(out)
    case Avg(_, out) => (sum(col(s"__p0_$out")) / sum(col(s"__p1_$out"))).as(out)
  }
}
