package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the replicate-and-salt pattern for joins whose
  * key distribution is too skewed for a plain shuffle join and whose small
  * side is too big to broadcast.
  *
  * A shuffled equi-join sends every row of a key to ONE task; a hot key
  * (the empty referrer, the null user, the one viral page) turns that task
  * into the straggler that dominates the stage. Salting splits the hot
  * key's probe rows across `nSalts` tasks by extending the join key with
  * `salt = hash(row) mod nSalts`, and REPLICATES each build-side row under
  * all `nSalts` salt values so every probe row still meets its match
  * exactly once. Join output is therefore row-for-row identical to the
  * unsalted join — salting changes the partitioning, never the semantics.
  *
  * Cost model: build side shuffles ×`nSalts` (replication), probe side
  * shuffles ×1; the hot key's probe work spreads across `nSalts` tasks.
  * Pick `nSalts` ≈ hot-key rows / target-partition rows. This is the
  * manual form of what AQE's `skewJoin` does at runtime — it exists for
  * the cases AQE can't see (skew behind a stage AQE won't re-plan, a
  * deterministic plan needed ahead of time, engines without AQE) and to
  * pin the shape in tests.
  *
  * Salting targets SHUFFLE joins by construction — replication would be
  * pure overhead under a broadcast, so [[salted]] pins the shuffle-hash
  * strategy via join hint rather than leaving the sf-size test plan to
  * pick a broadcast that a 100 TB build side forbids.
  */
object SkewJoin {

  /** Inner equi-join of `probe` ⋈ `build` on `keys`, salted `nSalts` ways.
    *
    * The probe-side salt is `monotonically_increasing_id() mod nSalts` — a
    * PER-ROW-unique source, so consecutive rows of a hot key round-robin
    * across all salt values regardless of their content. (A row-content
    * hash here would silently degenerate: fully-identical probe rows — or
    * a probe projected down to just the join keys, the common shape for
    * the hot-key scenario — all hash to ONE salt and the straggler
    * returns.) The result is salt-invariant either way; tests assert it,
    * including on duplicate probe rows. The build side is replicated via
    * one `explode(sequence(...))` — a narrow operation, no extra shuffle
    * beyond the join's own. Both sides shuffle on (keys, salt), uniform in
    * the salt dimension by construction, so no task sees more than
    * ~1/nSalts of any key. */
  def salted(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, "SkewJoin.salted: nSalts must be >= 1")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "SkewJoin.salted: inputs must not already carry a __salt column")
    val salted = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted
      .hint("shuffle_hash")
      .join(replicated, keys :+ "__salt")
      .drop("__salt")
  }
}
