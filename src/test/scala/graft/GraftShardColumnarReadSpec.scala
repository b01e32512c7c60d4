package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.ShardFormat

/** Columnar batch reads ([[graft.sources.v2.GraftShardReaderFactory
  * .supportColumnarReads]]): plain scans decode v3/v4 row groups
  * column-at-a-time into reused vectors. Pins: the batch path is
  * byte-exact vs the row path across every scalar type, null pattern,
  * and chunk codec; it ACTUALLY engages on plain scans (ColumnarToRow
  * in the plan) and stands down for filters / metadata columns /
  * embeddings / delete vectors; rename and widening resolve inside the
  * batch decode; legacy v1/v2 files in the same partition fall back to
  * the row decode without changing results. */
class GraftShardColumnarReadSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.colcat", classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.colcat.warehouse", warehouse)
    s
  }
  private lazy val warehouse = Files.createTempDirectory("graft_colread_spec").toString
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_colread_spec").toString + "/t"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def wideRows(lo: Long, n: Long) =
    spark.range(lo, lo + n).select(
      col("id"),
      when(col("id") % 7 =!= 0, col("id").cast("int")).as("i"),
      when(col("id") % 5 =!= 0, col("id") * 0.5).as("d"),
      (col("id") * 0.25).cast("float").as("fl"),
      (col("id") % 2 === 0).as("b"),
      when(col("id") % 3 =!= 0, concat(lit("s"), col("id"))).as("s"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("bin"))

  test("plain scans engage the batch path and read back byte-exact across types, nulls, codecs") {
    val dir = tmp()
    wideRows(0, 400).coalesce(1)
      .write.format("graftshard").mode("overwrite").save(dir)
    wideRows(400, 300).coalesce(1)
      .write.format("graftshard").option("compression", "dict").mode("append").save(dir)
    wideRows(700, 300).coalesce(1)
      .write.format("graftshard").option("compression", "deflate").mode("append").save(dir)

    val t = spark.read.format("graftshard").load(dir)
    assert(plan(t).contains("ColumnarToRow"),
      s"plain scan must go columnar:\n${plan(t)}")
    val got = t.collect().map(r => (
      r.getLong(0),
      if (r.isNullAt(1)) null else r.getInt(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      r.getFloat(3), r.getBoolean(4),
      if (r.isNullAt(5)) null else r.getString(5),
      new String(r.getAs[Array[Byte]](6), "UTF-8"))).sortBy(_._1)
    val want = (0L until 1000L).map { id => (
      id,
      if (id % 7 == 0) null else id.toInt,
      if (id % 5 == 0) null else id * 0.5,
      (id * 0.25).toFloat, id % 2 == 0,
      if (id % 3 == 0) null else s"s$id",
      s"b$id")}
    assert(got.toSeq == want)
    // projection stays columnar and exact
    val proj = t.select("s", "i")
    assert(plan(proj).contains("ColumnarToRow"))
    assert(proj.collect().length == 1000)
  }

  test("fallbacks: filters, metadata columns, embeddings, and MoR vectors take the row path with equal results") {
    val dir = tmp()
    wideRows(0, 200).coalesce(2)
      .write.format("graftshard").mode("overwrite").save(dir)
    val t = spark.read.format("graftshard").load(dir)

    val filtered = t.where(col("id") >= 100L)
    assert(!plan(filtered).contains("ColumnarToRow"),
      s"absorbed filters need the row path:\n${plan(filtered)}")
    assert(filtered.count() == 100)

    val meta = t.select(col("_shard_file"), col("id"))
    assert(!plan(meta).contains("ColumnarToRow"))
    assert(meta.collect().length == 200)

    // embeddings (array<float>) refuse columnar
    val emb = tmp()
    spark.range(0, 50)
      .select(col("id"), array(lit(1.0f), lit(2.0f)).as("v"))
      .coalesce(1).write.format("graftshard").mode("overwrite").save(emb)
    val et = spark.read.format("graftshard").load(emb)
    assert(!plan(et).contains("ColumnarToRow"))
    assert(et.count() == 50)

    // merge-on-read delete vectors refuse columnar, results stay live
    spark.sql("CREATE NAMESPACE colcat.mor")
    spark.range(0, 100).select(col("id"), col("id").as("v"))
      .coalesce(1).writeTo("colcat.mor.t").using("graftshard").create()
    spark.conf.set("spark.graftshard.rowLevel.mode", "merge-on-read")
    try spark.sql("DELETE FROM colcat.mor.t WHERE id % 4 = 0")
    finally spark.conf.unset("spark.graftshard.rowLevel.mode")
    val mt = spark.table("colcat.mor.t")
    assert(!plan(mt).contains("ColumnarToRow"))
    assert(mt.count() == 75)
  }

  test("rename and int->long widening resolve inside the batch decode; legacy files fall back in place") {
    spark.sql("CREATE NAMESPACE colcat.evo")
    spark.sql("CREATE TABLE colcat.evo.t (id BIGINT, n INT) USING graftshard")
    spark.range(0, 100).select(col("id"), col("id").cast("int").as("n"))
      .coalesce(1).writeTo("colcat.evo.t").append()
    spark.sql("ALTER TABLE colcat.evo.t RENAME COLUMN n TO m")
    spark.sql("ALTER TABLE colcat.evo.t ALTER COLUMN m TYPE BIGINT")
    spark.range(100, 200).select(col("id"), col("id") + 3000000000L)
      .toDF("id", "m").coalesce(1).writeTo("colcat.evo.t").append()

    val t = spark.table("colcat.evo.t")
    assert(plan(t).contains("ColumnarToRow"),
      s"evolution is metadata-only — the batch path must still engage:\n${plan(t)}")
    val got = t.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = (0L until 100L).map(id => (id, id)) ++
      (100L until 200L).map(id => (id, id + 3000000000L))
    assert(got.toSeq == want)

    // a v1-era file next to v3 appends: the mixed partition still reads
    // exactly (the legacy file row-decodes into the same vectors)
    val dir = tmp()
    new java.io.File(dir).mkdirs()
    val f = new java.io.File(dir, "v1.shard")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    out.write("GRFTSHD1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.writeByte(0x00); out.writeLong(3L)
    val hi = "hi".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(hi.length); out.write(hi)
    out.close()
    ShardFormat.writeManifest(dir, ShardFormat.Manifest(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))),
      generation = "v1", files = Seq(ShardFormat.FileEntry("v1.shard", f.length(), 1L,
        stats = Map("id" -> ((3L, 3L, 0L))), allNull = Map.empty)),
      version = 1L, createdAtMs = 1L, operation = "append"))
    Seq((10L, "x10"), (11L, "x11")).toDF("id", "s")
      .coalesce(1).write.format("graftshard").mode("append").save(dir)
    val mixed = spark.read.format("graftshard").load(dir)
    assert(plan(mixed).contains("ColumnarToRow"))
    assert(mixed.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((3L, "hi"), (10L, "x10"), (11L, "x11")))
  }
}
