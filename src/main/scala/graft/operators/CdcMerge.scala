package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an upsert/delete changeset to a
  * snapshot — the incremental-maintenance primitive behind every
  * lakehouse MERGE INTO (Delta/Iceberg/Hudi publish the same semantics).
  * The result is
  *   (snapshot rows whose key is NOT in the changeset)  ∪
  *   (changeset rows with op = upsert)
  * — deletes vanish, updates win wholesale (full-row replacement),
  * inserts are upserts of unseen keys. One anti join + one union: the
  * changeset is typically days-of-changes vs a full-history snapshot,
  * so AQE broadcasts its keys at runtime and the snapshot is never
  * shuffled; a changeset too big to broadcast runs as a shuffled anti
  * join on the key — still one shuffle, no row multiplication. (No
  * explicit broadcast hint: a hint would override the size threshold
  * and OOM the driver on exactly the oversized-changeset case the
  * fallback exists for.)
  *
  * Caller contract: `changes` carries the snapshot schema plus `opCol`
  * ∈ {"upsert", "delete"} — any other op value raises at execution
  * (silently dropping it would act as a delete: the key leaves the
  * snapshot via the anti join and nothing re-adds it) — and holds at
  * most one row per key (the compacted form every CDC stream reduces
  * to; enforce upstream with e.g. a max-by-version aggregate). */
object CdcMerge {

  val Upsert = "upsert"
  val Delete = "delete"

  def apply(
      snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "CdcMerge: need at least one key column")
    val dataCols = snapshot.columns.toSeq
    require(changes.columns.toSet == (dataCols :+ opCol).toSet,
      s"CdcMerge: changes must carry the snapshot schema + '$opCol', " +
        s"got ${changes.columns.mkString(",")} vs ${dataCols.mkString(",")}")
    val validated = changes.withColumn(opCol,
      when(col(opCol).isin(Upsert, Delete), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"CdcMerge: '$opCol' must be '$Upsert' or '$Delete', got '"),
          col(opCol), lit("'")))))
    val untouched = snapshot.join(
      validated.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = validated.where(col(opCol) === Upsert)
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
