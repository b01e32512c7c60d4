package graft.sources.v2

import java.io.File

/** Maintenance for graftshard tables. The manifest protocol makes
  * garbage inevitable BY DESIGN: aborted/speculative task attempts and
  * every overwritten generation leave `.shard` files no manifest
  * references (readers never see them — isolation is already total; the
  * cost is only storage). `vacuum` reclaims them with the standard lake
  * retention trade: a file is deleted only when it is BOTH unreferenced
  * by the current manifest AND older than `minAgeMs`. The age horizon is
  * what makes this safe against the one race a reference check cannot
  * see — a write IN FLIGHT has produced files that no manifest lists
  * yet; anything younger than the horizon is left alone. Pick the
  * horizon longer than any plausible write/commit duration (the default
  * mirrors the common lake default of days, not minutes, because a
  * retried 100 TB backfill can hold files uncommitted for hours).
  */
object GraftShardMaintenance {

  final case class VacuumReport(
      deleted: Seq[String],
      keptLive: Int,
      keptRecent: Seq[String])

  val DefaultMinAgeMs: Long = 24L * 3600 * 1000

  /** Deletes unreferenced `.shard` files and stale manifest temp files
    * older than `minAgeMs` under `dir`. Never touches the manifest or
    * any file it lists. */
  def vacuum(dir: String, minAgeMs: Long = DefaultMinAgeMs): VacuumReport = {
    val m = ShardFormat.readManifest(dir).getOrElse(throw new IllegalArgumentException(
      s"graftshard: no ${ShardFormat.ManifestName} under '$dir' — not a graftshard table"))
    val live = m.files.map(_.name).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val deleted = Seq.newBuilder[String]
    val keptRecent = Seq.newBuilder[String]
    var keptLive = 0
    Option(new File(dir).listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      val candidate =
        (n.endsWith(".shard") && !live.contains(n)) ||
          n.startsWith(s"${ShardFormat.ManifestName}.tmp-")
      if (n.endsWith(".shard") && live.contains(n)) keptLive += 1
      else if (candidate) {
        if (f.lastModified() <= cutoff) { if (f.delete()) deleted += n }
        else keptRecent += n
      }
    }
    VacuumReport(deleted.result().sorted, keptLive, keptRecent.result().sorted)
  }
}
