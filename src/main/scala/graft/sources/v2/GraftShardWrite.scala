package graft.sources.v2

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** V2 write path for `graftshard`: each task streams its partition
  * into one shard file under a task-unique name, returns a commit
  * message carrying (name, bytes, rows, per-column stats), and the
  * DRIVER publishes exactly the committed messages into the manifest
  * with an atomic rename ([[ShardFormat.writeManifest]]).
  *
  * That message-list-is-the-truth protocol is what makes the write
  * speculation-safe without any task-side rename dance: a speculative
  * duplicate or failed attempt leaves an orphan `.shard` file that NO
  * manifest references, so readers never see it (Spark's commit
  * coordinator already guarantees at most one committed attempt per
  * partition). Overwrite (`SupportsTruncate`) is a manifest swap —
  * prior shards become unreferenced garbage for a vacuum with a
  * retention horizon, the standard lake trade; append unions the old
  * manifest's file list with the new messages at commit time (schema
  * equality enforced at PLAN time, not task 10k's stack trace).
  */
class GraftShardWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var truncateRequested = false

  override def truncate(): WriteBuilder = { truncateRequested = true; this }

  override def build(): Write = {
    val schema = info.schema()
    schema.fields.foreach { f =>
      require(ShardFormat.supported(f.dataType),
        s"graftshard: unsupported column type ${f.dataType.sql} for '${f.name}' " +
          "(supported: long, int, double, float, boolean, string, binary, array<float>)")
    }
    if (!truncateRequested) ShardFormat.readManifest(path).foreach { m =>
      val same = m.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(same,
        s"graftshard: append schema ${schema.simpleString} does not match " +
          s"existing table schema ${m.schema.simpleString} at '$path'")
    }
    val doTruncate = truncateRequested
    new Write {
      override def toBatch: BatchWrite =
        new GraftShardBatchWrite(path, schema, doTruncate)
    }
  }
}

final case class ShardCommitMessage(
    name: String,
    bytes: Long,
    rows: Long,
    stats: Map[String, (Long, Long, Long)],
    allNull: Map[String, Long]) extends WriterCommitMessage

class GraftShardBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new GraftShardWriterFactory(path, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect {
      case m: ShardCommitMessage if m.rows > 0 =>
        ShardFormat.FileEntry(m.name, m.bytes, m.rows, m.stats, m.allNull)
    }
    // empty-partition shards carry no information — drop their files
    messages.collect { case m: ShardCommitMessage if m.rows == 0 => m.name }
      .foreach(n => new File(path, n).delete())
    // generation: fresh on truncate, carried on append — streaming
    // offsets embed it to detect overwrites (ShardOffset scaladoc)
    val existing = if (truncate) None else ShardFormat.readManifest(path)
    val prior = existing.map(_.files).getOrElse(Nil)
    val generation = existing.map(_.generation).filter(_.nonEmpty)
      .getOrElse(java.util.UUID.randomUUID().toString.take(8))
    ShardFormat.writeManifest(path,
      ShardFormat.Manifest(schema, generation, prior ++ committed))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: ShardCommitMessage => new File(path, m.name).delete(): Unit
      case _ => ()
    }
}

class GraftShardWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftShardDataWriter(path, schema, partitionId, taskId)
}

class GraftShardDataWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // taskId disambiguates speculative attempts of the same partition;
  // the UUID guards against taskId reuse across retried stages
  private val name =
    f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.shard"
  private val writer = {
    new File(path).mkdirs()
    new ShardFormat.ShardWriter(new File(path, name), schema)
  }

  override def write(record: InternalRow): Unit = writer.write(record)

  override def commit(): WriterCommitMessage = {
    val (bytes, rows, stats, allNull) = writer.finish()
    ShardCommitMessage(name, bytes, rows, stats, allNull)
  }

  override def abort(): Unit = writer.abort()
  override def close(): Unit = ()
}
