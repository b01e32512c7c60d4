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
    * older than `minAgeMs` under `dir`. "Referenced" means by the
    * current manifest OR any retained time-travel snapshot — vacuum
    * never breaks a version that is still loadable; run
    * [[expireSnapshots]] first to retire history, THEN vacuum reclaims
    * what only expired snapshots referenced (the Iceberg
    * expire_snapshots → remove_orphan_files order). Never touches the
    * manifest, snapshot manifests, or any file they list. */
  def vacuum(dir: String, minAgeMs: Long = DefaultMinAgeMs): VacuumReport = {
    val m = ShardFormat.readManifest(dir).getOrElse(throw new IllegalArgumentException(
      s"graftshard: no ${ShardFormat.ManifestName} under '$dir' — not a graftshard table"))
    val live = (m.files.map(_.name) ++
      ShardFormat.listVersions(dir)
        .flatMap(v => ShardFormat.readManifestVersion(dir, v))
        .flatMap(_.files.map(_.name))).toSet
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

  /** Retires time-travel history: keeps the newest `keepLast` snapshot
    * manifests (and ALWAYS the one the current pointer names), deletes
    * the rest. Shard files referenced only by expired snapshots become
    * vacuum-reclaimable. Returns the expired version numbers. */
  def expireSnapshots(dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "graftshard: keepLast must be >= 1")
    val current = ShardFormat.readManifest(dir).getOrElse(throw new IllegalArgumentException(
      s"graftshard: no ${ShardFormat.ManifestName} under '$dir' — not a graftshard table"))
    val versions = ShardFormat.listVersions(dir)
    val keep = versions.takeRight(keepLast).toSet + current.version
    val expired = versions.filterNot(keep)
    expired.foreach(v => ShardFormat.versionFile(dir, v).delete())
    expired
  }
}
