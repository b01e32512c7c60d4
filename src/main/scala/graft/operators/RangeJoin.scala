package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi key, via temporal banding — the
  * missing member of the temporal-join family next to [[AsOfJoin]] (the
  * reference has no joins at all; SURVEY §2.8).
  *
  * A naive point-in-interval join is a cross product with a range filter —
  * Catalyst can only run it as BroadcastNestedLoopJoin, quadratic work. The
  * banded form buckets time into `bucketWidth`-sized bands: each point
  * lands in exactly one band, each interval replicates to the bands it
  * covers (span/bucketWidth + 1 copies), the join is a plain equi-join on
  * the band, and exact containment filters survivors. Work scales with
  * true match density, shuffles are on band keys.
  *
  * Because a point belongs to exactly ONE band, every (point, interval)
  * match is produced exactly once — no post-join dedup.
  *
  * Choosing `bucketWidth` ≈ the typical interval span keeps replication
  * O(1) per interval. Hot bands (points clustering in time) are AQE
  * skew-join territory; pathological clustering can add a salt dimension.
  */
object RangeJoin {

  /** Join each point row to every interval row with
    * `start <= point < end` (half-open). `pointCol`/`startCol`/`endCol`
    * are numeric (e.g. epoch seconds); output = point columns ++ interval
    * columns (names must not clash). */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "pointInInterval: bucketWidth must be positive")
    val p = points.withColumn("__band", floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("__band",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("__band"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__band")
  }

  /** Interval × interval OVERLAP join (the genomics / ad-session shape):
    * every (left, right) pair whose half-open ranges intersect —
    * `ls < re && rs < le`. Same banding trick as [[pointInInterval]],
    * with the classic exactly-once rule for pairs that share SEVERAL
    * bands: a pair is emitted only in the band holding the overlap's
    * START, `floor(max(ls, rs) / bucketWidth)` — that band lies inside
    * both intervals' band spans (max(ls,rs) < min(le,re) when they
    * overlap), so no match is lost and none duplicates; no post-join
    * dedup shuffle. Replication stays span/bucketWidth + 1 per row,
    * the join is a plain band equi-join. Column names must not clash. */
  def intervalOverlap(
      left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "intervalOverlap: bucketWidth must be positive")
    def banded(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__band",
        explode(sequence(floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
    banded(left, leftStart, leftEnd).join(banded(right, rightStart, rightEnd), Seq("__band"))
      .where(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd) &&
        col("__band") === floor(greatest(col(leftStart), col(rightStart)) / bucketWidth))
      .drop("__band")
  }
}
