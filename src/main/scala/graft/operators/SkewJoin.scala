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
  * a salt in `[0, nSalts)`, and REPLICATES each build-side row under
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
    * The salt must be DETERMINISTIC per row, because it becomes a shuffle
    * partitioning key: on a real cluster a fetch-failure retry recomputes
    * only the lost map tasks, and a positionally-derived salt (e.g.
    * `monotonically_increasing_id`, `rand`, zipWithIndex) can assign a
    * recomputed row a different salt than the already-committed reducers
    * consumed — silently duplicating or dropping join rows (the
    * SPARK-23207 failure class). So the salt here is always a
    * content-derived hash:
    *
    *   - `saltFrom = Some(expr)` — hash of a caller-supplied expression,
    *     ideally a unique row id (primary key, file+offset, line number).
    *     This is the recommended form: deterministic AND uniform even when
    *     probe rows are wholly identical.
    *   - `saltFrom = None` — hash of ALL probe columns. Deterministic and
    *     retry-safe; its one degenerate case is a probe of fully-identical
    *     rows (e.g. projected down to just the hot join key), which all
    *     hash to one salt and re-create the straggler. If your probe can
    *     contain duplicate rows under a hot key, pass a unique id.
    *
    * The result is salt-invariant either way; tests assert it, including
    * on duplicate probe rows. The build side is replicated via one
    * `explode(sequence(...))` — a narrow operation, no extra shuffle
    * beyond the join's own. Both sides shuffle on (keys, salt); with a
    * well-spread salt no task sees more than ~1/nSalts of any key. */
  def salted(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      nSalts: Int, saltFrom: Option[Column] = None): DataFrame = {
    require(nSalts >= 1, "SkewJoin.salted: nSalts must be >= 1")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "SkewJoin.salted: inputs must not already carry a __salt column")
    val saltSource = saltFrom.getOrElse(hash(probe.columns.map(col).toSeq: _*))
    val salted = probe.withColumn("__salt",
      pmod(hash(saltSource), lit(nSalts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted
      .hint("shuffle_hash")
      .join(replicated, keys :+ "__salt")
      .drop("__salt")
  }
}
