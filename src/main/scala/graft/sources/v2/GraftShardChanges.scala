package graft.sources.v2

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Change Data Feed: `option("changesFrom", v1).option("changesTo",
  * v2)` reads the ROW-LEVEL delta between two committed snapshots —
  * every row inserted or deleted by the commits in `(v1, v2]`
  * (exclusive-from, inclusive-to: "what happened since the snapshot I
  * already consumed"), tagged `_change_type` ("insert" / "delete";
  * an update arrives as its delete+insert pair) and `_commit_version`.
  *
  * Why this is a 100 TB feature: incremental consumers — the dedup
  * band registry, feature refresh, downstream index builds — re-read
  * only what CHANGED instead of diffing two full snapshots (a
  * corpus-sized join). The plan cost is O(versions × manifest), zero
  * data reads beyond the changed rows themselves.
  *
  * Exactness rule (the admission test, per commit via
  * [[ShardFormat.Manifest.operation]]): a commit contributes changes
  * only when its file-level diff IS its row-level diff —
  *   - append / streaming epoch: added files are pure inserts;
  *   - overwrite / truncate / REPLACE WHERE: removed files' rows were
  *     ALL deleted (truncate) or all provably matched the replaced
  *     region, added files are pure inserts — exact by construction;
  *   - metadata DELETE: dropped files were provably all-match;
  *   - merge-on-read: delete-vector DELTAS are exactly the deleted
  *     ordinals; a fully-deleted file's remaining live rows are
  *     deletes; inserted files are inserts;
  *   - compact / alter / create: no row changed — contributes nothing;
  *   - copy-on-write row-level ops: REFUSED — a rewritten file mixes
  *     changed and unchanged rows, and reporting the whole file as
  *     delete+insert would be a lie. The error names the fix: run
  *     row-level ops under `spark.graftshard.rowLevel.mode=
  *     merge-on-read` when a change feed is consumed downstream
  *     (exactly Delta's CDF-vs-rewrite trade, resolved the honest way).
  *
  * The walk is COMMIT BY COMMIT (each pair of adjacent snapshots), so
  * a file inserted at v+1 and deleted at v+3 reports BOTH events —
  * a from→to endpoint diff would silently cancel them. Snapshots must
  * still be loadable (expireSnapshots defines the CDF horizon) and
  * changed files still on disk (vacuum honors retained snapshots, so
  * the horizons agree). */
object GraftShardChanges {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"

  /** One changed file at one commit. `skip`: delete-vector sidecar
    * whose ordinals were ALREADY dead before the commit (never part of
    * this delta). `emitOnly`: sidecar of ordinals dead AFTER the commit
    * — when set, the reader emits exactly `emitOnly \ skip` (the
    * merge-on-read delta). */
  final case class FileChange(
      file: String,
      rows: Long,
      commitVersion: Long,
      changeType: String,
      skip: Option[String] = None,
      emitOnly: Option[String] = None,
      commitTimestampMs: Long = 0L)

  /** Plans the feed: validates the range, classifies each commit, and
    * returns (manifest at `to` — its schema is the feed's base schema,
    * its alias/field-id maps resolve pre-rename files, per-file
    * changes). Driver-side manifest work only. */
  def plan(path: String, from: Long, to: Long): (ShardFormat.Manifest, Seq[FileChange]) = {
    require(from >= 0 && to >= from,
      s"graftshard: changesFrom/changesTo must satisfy 0 <= from <= to, got ($from, $to]")
    val current = ShardFormat.readManifest(path).getOrElse(
      throw new IllegalArgumentException(
        s"graftshard: no ${ShardFormat.ManifestName} under '$path'"))
    require(to <= current.version,
      s"graftshard: changesTo=$to is ahead of the table (v${current.version})")
    def snapshot(v: Long): ShardFormat.Manifest =
      ShardFormat.readManifestVersion(path, v).getOrElse(
        throw new IllegalArgumentException(
          s"graftshard: snapshot v$v was expired — the change feed horizon is " +
            s"the snapshot retention (available: ${ShardFormat.listVersions(path).mkString(", ")})"))
    val changes = Seq.newBuilder[FileChange]
    // from=0: no v0 snapshot ever exists (the first commit is v1 and
    // snapshots are written for version > 0) — the commit chain provably
    // starts empty, so synthesize the empty previous manifest instead of
    // refusing; the first commit's inserts are consumable like any other
    var prev =
      if (from == 0L) ShardFormat.Manifest(current.schema, "", Nil)
      else snapshot(from)
    (from + 1 to to).foreach { v =>
      val cur = snapshot(v)
      cur.operation match {
        case "compact" | "alter" | "create" => // no row changed
        case "upsert" =>
          throw new UnsupportedOperationException(
            s"graftshard: commit v$v at '$path' was an UPSERT (equality " +
              "delete + inserts) — which OLD rows its keys deleted is not " +
              "knowable from a file-level diff without scanning them. " +
              "Consume upserted tables as LATEST STATE (read the table) " +
              "rather than as a change feed, or ingest via merge-on-read " +
              "row-level operations when a feed is consumed downstream")
        case "cow" =>
          throw new UnsupportedOperationException(
            s"graftshard: commit v$v at '$path' was a copy-on-write row-level " +
              "rewrite — rewritten files mix changed and unchanged rows, so a " +
              "file-level diff cannot report row-level changes. Run row-level " +
              "operations under spark.graftshard.rowLevel.mode=merge-on-read " +
              "when a change feed is consumed downstream")
        case "rollback" =>
          throw new UnsupportedOperationException(
            s"graftshard: commit v$v at '$path' is a ROLLBACK — it can " +
              "resurrect rows (shrink a delete vector, restore replaced " +
              "files), which a change feed cannot represent as inserts and " +
              "deletes of whole files. Consume the table as LATEST STATE, " +
              "or restart the feed from the rollback commit onward")
        case "append" | "overwrite" | "replace" | "delete-metadata" | "mor" =>
          val prevBy = prev.files.map(fe => fe.name -> fe).toMap
          val curBy = cur.files.map(fe => fe.name -> fe).toMap
          cur.files.filterNot(fe => prevBy.contains(fe.name)).foreach { fe =>
            changes += FileChange(fe.name, fe.rows, v, "insert", skip = fe.deletes,
              commitTimestampMs = cur.createdAtMs)
          }
          prev.files.foreach { pfe =>
            curBy.get(pfe.name) match {
              case None =>
                // removed: every row live BEFORE the commit was deleted
                changes += FileChange(pfe.name, pfe.rows, v, "delete", skip = pfe.deletes,
                  commitTimestampMs = cur.createdAtMs)
              case Some(cfe) if cfe.deletes != pfe.deletes =>
                // merge-on-read delta: ordinals dead after, minus dead before
                changes += FileChange(pfe.name, pfe.rows, v, "delete",
                  skip = pfe.deletes, emitOnly = cfe.deletes,
                  commitTimestampMs = cur.createdAtMs)
              case _ => ()
            }
          }
        case other =>
          throw new UnsupportedOperationException(
            s"graftshard: commit v$v at '$path' has no change-feed " +
              s"classification (operation='$other') — the table predates the " +
              "change feed; start the feed from a later snapshot")
      }
      prev = cur
    }
    val planned = changes.result()
    planned.foreach { fc =>
      require(new File(path, fc.file).exists(),
        s"graftshard: changed file '${fc.file}' (commit v${fc.commitVersion}) was " +
          "vacuumed — the change feed horizon is the snapshot retention; " +
          "expireSnapshots before vacuum defines it")
    }
    (snapshot(to), planned)
  }

  /** Timestamp-addressed feed start (`option("changesFromTimestamp",
    * epochMs)`): resolves wall-clock time against each retained
    * snapshot's `createdAtMs` — the SAME anchor TIMESTAMP AS OF uses —
    * to the newest committed version at or before `tMs`. A consumer on
    * a wall-clock schedule ("changes since last night's run") gets the
    * version arithmetic done for it: the resolved version's OWN changes
    * are excluded (state as of `tMs` was already consumed), everything
    * after is the delta. `tMs` before the earliest retained commit is
    * refused — pre-horizon commit times are unknowable, and silently
    * starting at 0 could replay inserts the caller saw long ago. */
  def resolveTimestamp(path: String, tMs: Long): Long = {
    val current = ShardFormat.readManifest(path).getOrElse(
      throw new IllegalArgumentException(
        s"graftshard: no ${ShardFormat.ManifestName} under '$path'"))
    val known: Seq[(Long, Long)] =
      (ShardFormat.listVersions(path)
        .flatMap(v => ShardFormat.readManifestVersion(path, v))
        .map(m => m.version -> m.createdAtMs) :+ (current.version -> current.createdAtMs))
        .distinct.sortBy(_._1)
    val atOrBefore = known.filter(_._2 <= tMs)
    if (atOrBefore.isEmpty)
      throw new IllegalArgumentException(
        s"graftshard: changesFromTimestamp=$tMs precedes the earliest retained " +
          s"commit (v${known.head._1} at ${known.head._2}) at '$path' — the feed " +
          "horizon is the snapshot retention; start from an explicit version " +
          "(changesFrom=0 replays the full history)")
    atOrBefore.last._1
  }

  /** FileChanges → input partitions (shared by the batch scan and the
    * streaming feed). */
  def toPartitions(path: String, changes: Seq[FileChange]): Array[InputPartition] =
    changes.map(fc => ShardChangePartition(
      new File(path, fc.file).getPath, fc.commitVersion, fc.changeType,
      fc.skip.map(d => new File(path, d).getPath),
      fc.emitOnly.map(d => new File(path, d).getPath),
      fc.commitTimestampMs): InputPartition).toArray
}

/** The read-only table face of the feed: base schema at `changesTo`
  * plus the two change columns. Filters/aggregates are left to Spark
  * (a delta is already small by construction); column pruning is
  * supported so an id-only consumer decodes nothing else. */
class GraftShardChangesTable(path: String, from: Long, to: Long, toExplicit: Boolean = true)
    extends Table with SupportsRead {
  private lazy val planned = GraftShardChanges.plan(path, from, to)

  override def name(): String = s"graftshard.`$path`@changes($from,$to]"
  override def schema(): StructType = StructType(
    planned._1.schema.fields.toSeq :+
      StructField(GraftShardChanges.ChangeTypeCol, StringType, nullable = false) :+
      StructField(GraftShardChanges.CommitVersionCol, LongType, nullable = false) :+
      // the commit's createdAtMs — epoch millis, the TIMESTAMP AS OF
      // anchor, so a consumer can window changes by wall clock
      StructField(GraftShardChanges.CommitTimestampCol, LongType, nullable = false))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // streaming admission control: cap each micro-batch at N commits
    // (the version IS the feed's atomic unit — a batch boundary can
    // never split one commit's delta)
    val maxVersions = Option(options.get("maxVersionsPerTrigger")).map(_.toInt)
    maxVersions.foreach(n => require(n > 0,
      s"graftshard: maxVersionsPerTrigger must be > 0, got $n"))
    new GraftShardChangesScanBuilder(path, planned._1.schema, schema(), planned._2,
      from, toExplicit, planned._1.resolution, maxVersions)
  }
}

class GraftShardChangesScanBuilder(
    path: String,
    baseSchema: StructType,
    fullSchema: StructType,
    changes: Seq[GraftShardChanges.FileChange],
    from: Long,
    toExplicit: Boolean,
    resolve: ShardFormat.ColumnResolution = ShardFormat.ColumnResolution.empty,
    maxVersionsPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String =
      s"graftshard changes (${changes.size} changed files)"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      GraftShardChanges.toPartitions(path, changes)
    override def createReaderFactory(): PartitionReaderFactory =
      new ShardChangesReaderFactory(baseSchema, required, resolve)

    /** The STREAMING change feed: offsets are manifest versions; each
      * micro-batch is the exact delta over `(startV, endV]`. An
      * incremental consumer (the dedup band registry, an index
      * refresher) subscribes to the table's row-level changes instead
      * of re-diffing snapshots per run. A copy-on-write commit fails
      * the batch loudly with the merge-on-read pointer (same admission
      * rule as the batch feed); the expireSnapshots horizon applies —
      * retain snapshots at least as long as the slowest consumer's
      * lag. */
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
      require(!toExplicit,
        "graftshard: a streaming change feed is unbounded — drop changesTo " +
          "(changesFrom names the version the stream starts after)")
      new GraftShardChangesMicroBatchStream(path, from, baseSchema, required,
        maxVersionsPerTrigger)
    }
  }
}

final case class ChangesOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}
object ChangesOffset {
  def fromJson(j: String): ChangesOffset = {
    val m = """\{"version":(\d+)\}""".r
    j match {
      case m(v) => ChangesOffset(v.toLong)
      case _ => throw new IllegalArgumentException(s"graftshard: bad changes offset '$j'")
    }
  }
}

/** Admission control for the feed: `option("maxVersionsPerTrigger", n)`
  * caps each micro-batch at n COMMITS — a consumer catching up over a
  * deep backlog (the "changes since last week" bootstrap) drains it in
  * bounded batches instead of replaying every retained version in one
  * commit. Versions ride the `ReadMaxFiles` carrier (the version is
  * the feed's admission unit the way the file is the table stream's);
  * a batch boundary can never split one commit's delta. */
class GraftShardChangesMicroBatchStream(
    path: String,
    startVersion: Long,
    baseSchema: StructType,
    required: StructType,
    maxVersionsPerTrigger: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxFiles}

  override def initialOffset(): Offset = ChangesOffset(startVersion)
  override def latestOffset(): Offset = ChangesOffset(
    ShardFormat.readManifest(path).map(_.version).getOrElse(startVersion))

  // Trigger.AvailableNow: pin this run's end version (without
  // SupportsTriggerAvailableNow, Spark's wrapper DISCARDS read limits
  // for AvailableNow runs)
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(
      ShardFormat.readManifest(path).map(_.version).getOrElse(startVersion))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val current = ShardFormat.readManifest(path).map(_.version).getOrElse(startVersion)
    val latest = availableNowCap.map(math.min(_, current)).getOrElse(current)
    val from = start.asInstanceOf[ChangesOffset].version
    def admit(l: ReadLimit): Long = l match {
      case _: ReadAllAvailable => latest
      case f: ReadMaxFiles => math.min(latest, from + f.maxFiles())
      case c: CompositeReadLimit => c.getReadLimits.map(admit).min
      case other => throw new UnsupportedOperationException(
        s"graftshard: unsupported change-feed read limit $other — use " +
          "maxVersionsPerTrigger")
    }
    ChangesOffset(math.max(from, admit(limit)))
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = ChangesOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangesOffset].version
    val e = end.asInstanceOf[ChangesOffset].version
    if (e <= s) Array.empty
    else GraftShardChanges.toPartitions(path, GraftShardChanges.plan(path, s, e)._2)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardChangesReaderFactory(baseSchema, required,
      ShardFormat.readManifest(path).map(_.resolution)
        .getOrElse(ShardFormat.ColumnResolution.empty))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class ShardChangePartition(
    file: String,
    commitVersion: Long,
    changeType: String,
    skip: Option[String],
    emitOnly: Option[String],
    commitTimestampMs: Long) extends InputPartition

class ShardChangesReaderFactory(
    baseSchema: StructType, required: StructType,
    resolve: ShardFormat.ColumnResolution = ShardFormat.ColumnResolution.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardChangePartition]
    new ShardChangesPartitionReader(p, baseSchema, required, resolve)
  }
}

/** Decodes one changed file, emitting the delta rows with the change
  * columns appended. Ordinal selection is a pointer walk over the
  * SORTED delete vectors against the sequential physical ordinal —
  * O(1) memory, no hash sets. */
class ShardChangesPartitionReader(
    p: ShardChangePartition,
    baseSchema: StructType,
    required: StructType,
    resolve: ShardFormat.ColumnResolution = ShardFormat.ColumnResolution.empty)
    extends PartitionReader[InternalRow] {

  // required base columns -> table indices (change columns served here)
  private val baseIdx: Array[Int] =
    required.fields.collect {
      case f if baseSchema.fieldNames.contains(f.name) => baseSchema.fieldIndex(f.name)
    }
  private val reader = new ShardFormat.ShardReader(new File(p.file), baseSchema, baseIdx,
    resolve = resolve)
  private val values = new Array[Any](baseIdx.length)

  // slots of the two synthetic columns in the required output
  private val outSlots: Array[Any => Any] = {
    var b = -1
    required.fields.map { f =>
      if (f.name == GraftShardChanges.ChangeTypeCol)
        (_: Any) => UTF8String.fromString(p.changeType)
      else if (f.name == GraftShardChanges.CommitVersionCol)
        (_: Any) => Long.box(p.commitVersion)
      else if (f.name == GraftShardChanges.CommitTimestampCol)
        (_: Any) => Long.box(p.commitTimestampMs)
      else { b += 1; val i = b; (vs: Any) => vs.asInstanceOf[Array[Any]](i) }
    }
  }

  // dead-before ordinals are never part of this delta; for a
  // merge-on-read delta only dead-after ordinals are
  private val skip: Array[Long] =
    p.skip.map(d => ShardFormat.readDeleteVector(new File(d))).getOrElse(Array.emptyLongArray)
  private val emitOnly: Option[Array[Long]] =
    p.emitOnly.map(d => ShardFormat.readDeleteVector(new File(d)))

  private var ordinal = -1L
  private var si = 0 // pointer into skip
  private var ei = 0 // pointer into emitOnly
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (reader.next(values)) {
      ordinal += 1
      while (si < skip.length && skip(si) < ordinal) si += 1
      val dead = si < skip.length && skip(si) == ordinal
      val selected = emitOnly match {
        case None => !dead
        case Some(eo) =>
          while (ei < eo.length && eo(ei) < ordinal) ei += 1
          !dead && ei < eo.length && eo(ei) == ordinal
      }
      if (selected) {
        val out = new Array[Any](outSlots.length)
        var i = 0
        while (i < outSlots.length) { out(i) = outSlots(i)(values); i += 1 }
        row = new GenericInternalRow(out)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
