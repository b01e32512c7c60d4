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
  * inserts are upserts of unseen keys. One anti join + one union:
  * the changeset is typically days-of-changes vs a full-history
  * snapshot, so the anti join broadcasts the changeset's keys and the
  * snapshot is never shuffled; at changeset sizes past broadcast the
  * same plan degrades to a shuffled anti join on the key — still one
  * shuffle, no row multiplication.
  *
  * Caller contract: `changes` carries the snapshot schema plus `opCol`
  * ∈ {"upsert", "delete"}, and holds at most one row per key (the
  * compacted form every CDC stream reduces to; enforce upstream with
  * e.g. a max-by-version aggregate). */
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
    val untouched = snapshot.join(
      broadcast(changes.select(keyCols.map(col): _*)), keyCols, "left_anti")
    val upserts = changes.where(col(opCol) === Upsert)
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
