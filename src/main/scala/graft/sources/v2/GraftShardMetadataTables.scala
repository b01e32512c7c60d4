package graft.sources.v2

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Inspection faces over a table's METADATA (the Iceberg
  * `db.table.files` / `db.table.snapshots` idea): `SELECT * FROM
  * cat.ns.t.files` lists the manifest's file entries, `....snapshots`
  * the retained time-travel history. The rows are manifest-resident —
  * already driver-materialized by every planner pass — so the scan is
  * a [[LocalScan]] (driver-local, zero executor work): at 100 TB the
  * ops questions ("how many small files?", "what did the 3am job
  * commit?", "what would rollback restore?") are answered without
  * touching a shard file, and the answers compose with full SQL
  * (GROUP BY, ORDER BY, joins against job logs).
  *
  * Resolution: `cat.ns.t.files` parses as namespace=[ns, t],
  * name=files — [[GraftCatalog.loadTable]] falls back to the face only
  * when no REAL table shadows the name and the base table exists, so
  * a genuine table named `files` always wins. */
object GraftShardMetadataTables {
  val Names: Set[String] = Set("files", "snapshots", "partitions", "branches")

  def schemaOf(meta: String): StructType = meta match {
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("deleted_rows", LongType, nullable = false),
      StructField("partition", LongType, nullable = true),
      StructField("seq", LongType, nullable = false),
      StructField("has_delete_vector", BooleanType, nullable = false),
      StructField("has_bloom", BooleanType, nullable = false)))
    case "snapshots" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = true),
      StructField("files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("generation", StringType, nullable = false)))
    // the skew-diagnosis view: one row per partition key (null = the
    // unkeyed pool — pre-evolution files, or the whole unkeyed table)
    case "partitions" => StructType(Seq(
      StructField("partition", LongType, nullable = true),
      StructField("files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("deleted_rows", LongType, nullable = false)))
    // the write-audit-publish staging area: one row per staged branch,
    // with the base the publish will be validated against
    case "branches" => StructType(Seq(
      StructField("branch", StringType, nullable = false),
      StructField("staged_version", LongType, nullable = false),
      StructField("base_version", LongType, nullable = false),
      StructField("staged_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = true),
      StructField("files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("publishable", BooleanType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"graftshard: unknown metadata table '$other' — supported: " +
        Names.toSeq.sorted.mkString(", "))
  }

  /** Rows computed at SCAN BUILD time (a fresh manifest read — a
    * cached table reference never serves stale metadata). */
  def rowsOf(meta: String, dir: String): Array[InternalRow] = {
    val m = ShardFormat.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(
        s"graftshard: no ${ShardFormat.ManifestName} under '$dir' — " +
          "not a graftshard table"))
    meta match {
      case "files" => m.files.map { fe =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(fe.name), fe.bytes, fe.rows, fe.deletedRows,
          fe.partition.map(Long.box).orNull, fe.seq,
          fe.deletes.isDefined, fe.bloom.isDefined)): InternalRow
      }.toArray
      case "snapshots" =>
        // the pointer's state is always a row, even on a pre-versioning
        // table whose v-file never existed
        val versions = ShardFormat.listVersions(dir)
        val all =
          if (versions.contains(m.version)) versions
          else versions :+ m.version
        all.sorted.flatMap { v =>
          val s = if (v == m.version) Some(m) else ShardFormat.readManifestVersion(dir, v)
          s.map { sm =>
            new GenericInternalRow(Array[Any](
              sm.version, sm.createdAtMs * 1000L,
              if (sm.operation.isEmpty) null else UTF8String.fromString(sm.operation),
              sm.files.size.toLong, sm.files.map(_.rows).sum,
              sm.files.map(_.bytes).sum,
              UTF8String.fromString(sm.generation))): InternalRow
          }
        }.toArray
      case "partitions" =>
        m.files.groupBy(_.partition).toSeq.sortBy(_._1).map { case (p, fes) =>
          new GenericInternalRow(Array[Any](
            p.map(Long.box).orNull, fes.size.toLong, fes.map(_.rows).sum,
            fes.map(_.bytes).sum, fes.map(_.deletedRows).sum)): InternalRow
        }.toArray
      case "branches" =>
        ShardFormat.listBranches(dir).flatMap { b =>
          ShardFormat.readBranch(dir, b).map { bm =>
            // the fork point: recorded by every staged commit since
            // multi-commit branches; pre-branchBase snapshots carried
            // exactly one commit, so version-1 is exact for them
            val base = bm.branchBase.getOrElse(bm.version - 1)
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(b), bm.version, base,
              bm.createdAtMs * 1000L,
              if (bm.operation.isEmpty) null else UTF8String.fromString(bm.operation),
              bm.files.size.toLong, bm.files.map(_.rows).sum,
              bm.files.map(_.bytes).sum,
              // publishable NOW: the fork point is still the live
              // version (an interleaved commit flips this to false)
              base == m.version)): InternalRow
          }
        }.toArray
      case other => throw new IllegalArgumentException(
        s"graftshard: unknown metadata table '$other'")
    }
  }
}

class GraftShardMetadataTable(baseDir: String, meta: String)
    extends Table with SupportsRead {
  private val tableSchema = GraftShardMetadataTables.schemaOf(meta)
  override def name(): String = s"graftshard.$meta($baseDir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        private val computed = GraftShardMetadataTables.rowsOf(meta, baseDir)
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] = computed
        override def description(): String = s"graftshard-metadata $meta"
      }
    }
}
