package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.ShardFormat

/** Schema evolution on graftshard — METADATA-ONLY both directions,
  * carried by the v2 self-describing shard files (column header):
  * ADD COLUMN null-fills old files at read time, DROP COLUMN
  * byte-skips stored bytes by the header's type tag. Pins: no file is
  * rewritten, time travel preserves the pre-ALTER schema, the
  * drop-then-re-add resurrection trap is refused via tombstones (and
  * released by truncate), and renames/type changes are refused. */
class GraftShardSchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.evcat", classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.evcat.warehouse", warehouse)
    s
  }
  private lazy val warehouse = Files.createTempDirectory("graft_evolution_spec").toString

  private def shardSnapshot(dir: String): Map[String, Long] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".shard"))
      .map(f => f.getName -> f.lastModified()).toMap

  test("ADD COLUMN: old files read as null, no file touched, time travel keeps the old schema") {
    spark.sql("CREATE NAMESPACE evcat.add")
    spark.sql("CREATE TABLE evcat.add.t (id BIGINT, v BIGINT) USING graftshard")
    spark.sql("INSERT INTO evcat.add.t SELECT id, id * 2 FROM range(0, 20)")
    val dir = s"$warehouse/add/t"
    val filesBefore = shardSnapshot(dir)
    val vBefore = ShardFormat.readManifest(dir).get.version

    spark.sql("ALTER TABLE evcat.add.t ADD COLUMN lang STRING")
    assert(shardSnapshot(dir) == filesBefore, "ADD COLUMN must touch no file")
    val t = spark.table("evcat.add.t")
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "lang"))
    assert(t.where(col("lang").isNull).count() == 20, "old rows read as null")

    // new rows carry the column; mixed reads and filters are sound
    spark.sql("INSERT INTO evcat.add.t VALUES (100, 200, 'en'), (101, 202, 'de')")
    assert(spark.table("evcat.add.t").count() == 22)
    assert(spark.table("evcat.add.t").where(col("lang") === "en")
      .collect().map(_.getLong(0)).toSeq == Seq(100L))
    // a filter on the new column drops old (null) rows, never errors
    assert(spark.table("evcat.add.t").where(col("lang") =!= "zz").count() == 2)

    // time travel: the pre-ALTER snapshot still has the 2-column schema
    val old = spark.sql(s"SELECT * FROM evcat.add.t VERSION AS OF $vBefore")
    assert(old.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(old.count() == 20)
  }

  test("DROP COLUMN: metadata-only, bytes skipped; re-add refused (tombstone); truncate releases it") {
    spark.sql("CREATE NAMESPACE evcat.drop")
    spark.sql("CREATE TABLE evcat.drop.t (id BIGINT, junk STRING, v BIGINT) USING graftshard")
    spark.sql("INSERT INTO evcat.drop.t VALUES (1, 'a', 10), (2, 'b', 20)")
    val dir = s"$warehouse/drop/t"
    val filesBefore = shardSnapshot(dir)

    spark.sql("ALTER TABLE evcat.drop.t DROP COLUMN junk")
    assert(shardSnapshot(dir) == filesBefore, "DROP COLUMN must touch no file")
    val t = spark.table("evcat.drop.t")
    assert(t.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(t.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))

    // resurrection trap: old files still store 'junk' — re-adding the
    // name must be refused while any of them might survive
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE evcat.drop.t ADD COLUMN junk STRING")
    }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // a DIFFERENT name is fine
    spark.sql("ALTER TABLE evcat.drop.t ADD COLUMN junk2 STRING")

    // truncate replaces every file -> tombstone clears -> re-add works
    spark.sql("INSERT OVERWRITE evcat.drop.t SELECT id, id, CAST(NULL AS STRING) FROM range(0, 3)")
    assert(ShardFormat.readManifest(dir).get.droppedColumns.isEmpty)
    spark.sql("ALTER TABLE evcat.drop.t ADD COLUMN junk STRING")
    assert(spark.table("evcat.drop.t").where(col("junk").isNotNull).count() == 0,
      "no resurrected values after the truncate")
  }

  test("refusals: rename, type change, non-nullable add, dropping the partition or sort column") {
    spark.sql("CREATE NAMESPACE evcat.refuse")
    spark.sql("""CREATE TABLE evcat.refuse.t (id BIGINT, k BIGINT, v BIGINT)
      USING graftshard PARTITIONED BY (k)""")
    spark.range(0, 10).select(col("id"), (col("id") % 2).as("k"), col("id").as("v"))
      .writeTo("evcat.refuse.t").option("sortWithinShards", "id").overwrite(lit(true))

    def refused(sql: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      assert(e.getMessage.toLowerCase.contains(needle), s"$sql => ${e.getMessage}")
    }
    refused("ALTER TABLE evcat.refuse.t RENAME COLUMN v TO w", "refused")
    // type changes are refused by Spark itself before the catalog sees them
    refused("ALTER TABLE evcat.refuse.t ALTER COLUMN v TYPE INT", "not supported")
    refused("ALTER TABLE evcat.refuse.t ADD COLUMN c BIGINT NOT NULL", "nullable")
    refused("ALTER TABLE evcat.refuse.t DROP COLUMN k", "partition column")
    refused("ALTER TABLE evcat.refuse.t DROP COLUMN id", "sort column")
    // the table is untouched by the refusals
    assert(spark.table("evcat.refuse.t").count() == 10)
  }

  test("evolved column: stats-based surfaces stay sound (no pruning lies, aggregates refuse)") {
    spark.sql("CREATE NAMESPACE evcat.stats")
    spark.sql("CREATE TABLE evcat.stats.t (id BIGINT) USING graftshard")
    spark.sql("INSERT INTO evcat.stats.t SELECT id FROM range(0, 100)")
    spark.sql("ALTER TABLE evcat.stats.t ADD COLUMN score BIGINT")
    spark.sql("INSERT INTO evcat.stats.t VALUES (1000, 7)")
    // filter on the evolved column: old files have no stats for it, so
    // they cannot be pruned — and their null rows must drop row-level
    assert(spark.table("evcat.stats.t").where(col("score") === 7L)
      .collect().map(_.getLong(0)).toSeq == Seq(1000L))
    // min/max/count(col) pushdown requires stats in EVERY file — the
    // evolved column refuses pushdown but still answers correctly
    val agg = spark.table("evcat.stats.t")
      .agg(count(col("score")).as("n"), min(col("score")).as("mn")).collect()(0)
    assert(agg.getLong(0) == 1L && agg.getLong(1) == 7L)
    assert(spark.table("evcat.stats.t").count() == 101)
  }
}
