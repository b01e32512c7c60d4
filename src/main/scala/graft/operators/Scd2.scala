package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing dimension (SCD2): turn a change log into a
  * versioned dimension — one row per (key, accepted change) carrying
  * `valid_from` (its change timestamp), `valid_to` (the next accepted
  * change's timestamp for the key; null while current), `is_current`.
  * The versioned-history primitive behind warehouse dimensions, offline
  * feature stores, and any point-in-time join ([[AsOfJoin]] consumes
  * exactly this shape).
  *
  * Semantics: within one (key, timestamp), the row with the LARGEST
  * `tieBreakCol` wins and the others are dropped (the compacted
  * same-instant rule, mirroring [[CdcMerge]]'s one-row-per-key
  * contract but enforced here, where a change log legitimately carries
  * collisions). Version intervals are half-open `[valid_from,
  * valid_to)`, so a point-in-time lookup at exactly a change's
  * timestamp sees the new version.
  *
  * Scale shape: [[fromChangeLog]] is ONE shuffle on the key + one
  * in-partition sort: ordering by (timestamp, tie-break) makes the
  * accepted version the LAST row of each same-timestamp run, and that
  * row's `lead(ts)` is already the next DISTINCT timestamp — tie-break
  * dedup and interval chaining fall out of a single window pass (a
  * separate dedup window over (key, ts) would force a second
  * Exchange).
  * [[applyChanges]] is the production face: history rows pass through
  * UNTOUCHED (never re-shuffled, never rewritten — at 100 TB the
  * closed-version history dwarfs any increment), and only the affected
  * keys' open rows + the increment re-window; unaffected keys route
  * through an anti join that AQE turns into a broadcast when the
  * increment's key set is small, which is the daily-batch norm. */
object Scd2 {

  /** Full build: change log → versioned dimension. Input must carry
    * `keyCol`, `tsCol`, `tieBreakCol`; all other columns ride along as
    * the version's attributes. Rows with a NULL timestamp are dropped
    * up front — a change without a time cannot be placed on the version
    * axis, and leaving it to the window would drop or keep such rows
    * inconsistently (three-valued logic in the dedup predicate,
    * position-dependent). */
  def fromChangeLog(
      changes: DataFrame, keyCol: String, tsCol: String,
      tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreakCol))
    changes
      .where(col(tsCol).isNotNull)
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      // last row of a same-timestamp run (largest tie-break) is the
      // accepted version; rows whose successor shares their timestamp
      // are the tie losers (exact duplicate rows dedup here too)
      .where(col("__next_ts").isNull || col("__next_ts") =!= col(tsCol))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", col("__next_ts"))
      .drop("__next_ts")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental maintenance: fold a NEW batch of changes into an
    * existing SCD2 dimension. Equivalent to rebuilding from the full
    * concatenated log ([[fromChangeLog]]) — asserted as a property in
    * Scd2Spec — provided the increment is no older than the closed
    * history it extends: for every key, new timestamps must be >= the
    * key's open-row `valid_from` (the append-only contract of a change
    * log; a late row older than an already-closed version would require
    * rewriting history, which is a backfill rebuild, not an increment).
    * A new change that COLLIDES with the open row's timestamp re-runs
    * the tie-break against it, exactly as the full rebuild would. */
  def applyChanges(
      dim: DataFrame, changes: DataFrame, keyCol: String, tsCol: String,
      tieBreakCol: String): DataFrame = {
    val keys = changes.select(keyCol).distinct()
    val touched = dim.join(keys, Seq(keyCol), "left_semi")
    val untouched = dim.join(keys, Seq(keyCol), "left_anti")
    val versionCols = Seq("valid_from", "valid_to", "is_current")
    // an affected key's open row re-enters the window as a change row
    // (its attrs + original timestamp); closed rows are already final —
    // every new timestamp lands at or after them
    val reopened = touched.where(col("valid_to").isNull)
      .drop(versionCols: _*)
    val rebuilt = fromChangeLog(reopened.unionByName(changes),
      keyCol, tsCol, tieBreakCol)
    // the oldest rebuilt row of a key was open; if the increment closed
    // it, the pass-through closed history still ends where the rebuilt
    // rows begin, so the union is seamless
    touched.where(col("valid_to").isNotNull)
      .unionByName(rebuilt)
      .unionByName(untouched)
  }
}
