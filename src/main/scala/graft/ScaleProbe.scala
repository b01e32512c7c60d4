package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe (dev tool, not part of the driver contract): replicates
  * the sf0.1 tables 10× into /tmp with shifted keys/mutated text, then
  * times headline operators at 1× and 10× to expose super-linear behavior
  * before it bites at 100 TB. Run: `sbt "runMain graft.ScaleProbe"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val big = "/tmp/graft_sf1"

    def time(dir: String, name: String): Double = {
      // operators persist() shared branches; a prior identical run would
      // satisfy them from the cache (CacheManager matches canonicalized
      // plans) and make the measurement warm — clear for a cold run
      CacheRegistry.unpersistAll() // drain the registry's handle buffer too
      spark.catalog.clearCache()
      graft.queries.ExtensionQueries.clearArtifactCaches()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    def replicate(table: String, idCols: Seq[String], textCol: Option[String]): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val copies = (0 until 10).map { i =>
        val shifted = idCols.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(i * 10000000L)))
        textCol.fold(shifted)(t =>
          shifted.withColumn(t, concat(col(t), lit(s" copytag$i"))))
      }
      copies.reduce(_ unionAll _).write.mode("overwrite").parquet(s"$big/$table.parquet")
    }
    // Constant-density fixture builder SHARED by cd and cd100 — one
    // generator, because two drifting variants of the same fixture
    // concept is how a fix lands in one and not the other. crossJoin
    // with a copy index (a union of N branches pays N-way plan analysis,
    // itself a probe artifact); per-copy whitespace-class token salts
    // with a `_` separator (salt c1 + token "2x" must not collide with
    // salt c12 + token "x"); per-copy sign-flipped embeddings (an
    // orthogonal diagonal transform: within-copy angular structure
    // exact, cross-copy cosines scramble to ~0 — new data brings its own
    // near-dups instead of duplicating the old data).
    // The repartition before each write is LOAD-BEARING: the source
    // tables are single row groups, so crossJoin(base, range) yields ONE
    // output partition and the fixture would be a single parquet file —
    // every downstream probe would read it single-threaded and the
    // "ratio" would measure the parallelism floor, not the operator
    // (the old union-of-N builder wrote ~N files as a side effect; a
    // real multi-TB corpus is many files, so multi-file IS the honest
    // layout).
    def buildCdCore(out: String, copies: Int): Unit = {
      val rng = spark.range(copies).select(col("id").cast("int").as("copy"))
      spark.read.parquet(s"$src/documents.parquet").crossJoin(rng)
        .withColumn("doc_id", col("doc_id") + col("copy").cast("long") * 10000000L)
        .withColumn("text", regexp_replace(col("text"),
          lit("(^|[ \\t\\n\\x0B\\f\\r])"), concat(lit("$1c"), col("copy"), lit("_"))))
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      spark.read.parquet(s"$src/embeddings.parquet").crossJoin(rng)
        .withColumn("embedding", expr("transform(embedding, (x, d) -> " +
          "CAST(x * (CASE WHEN pmod(hash(copy, d), 2) = 0 THEN 1.0 ELSE -1.0 END) " +
          "AS FLOAT))"))
        .withColumn("vec_id", col("vec_id") + col("copy").cast("long") * 10000000L)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    // probe-name args are validated BEFORE any fixture build (a typo
    // must fail in milliseconds, not after a multi-minute rebuild); the
    // literal arg "reuse" skips rebuilding fixtures that already exist —
    // explicit opt-in, so a changed builder can never silently serve a
    // stale fixture.
    def selectProbes(mode: String, known: Seq[String]): (Seq[String], Boolean) = {
      val opts = args.drop(1).toSet
      val reuse = opts.contains("reuse")
      val names = opts - "reuse"
      val unknown = names -- known.toSet
      require(unknown.isEmpty,
        s"ScaleProbe $mode: unknown probe name(s): ${unknown.mkString(", ")}")
      (if (names.isEmpty) known else known.filter(names), reuse)
    }
    // reuse keys on the _SUCCESS marker of the LAST table the builder
    // writes, not bare directory existence: a build killed mid-write
    // leaves a partial parquet directory that a directory check would
    // silently serve (fewer rows → skewed ratios, or a confusing failure
    // far from the cause).
    def ensureFixture(out: String, copies: Int, reuse: Boolean): Unit =
      if (!reuse || !java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$out/embeddings.parquet/_SUCCESS")))
        buildCdCore(out, copies)

    // ------------------------------------------------ as-of A/B (asof)
    // `runMain graft.ScaleProbe asof` — composed window face
    // (AsOfJoin.backward, x2) vs custom physical merge face
    // (AsOfJoin.backwardMerge, x39) on the SAME contract, across the
    // regimes the merge face's scaladoc claims to win: a WIDE left
    // payload (the union face shuffles every right row padded with the
    // left's column slots — UnsafeRow allocates its 8 bytes per slot
    // even for nulls) and a 10x corpus. Each cell is timed twice
    // (cold, warm): a cold-only gap that vanishes warm is fixed
    // codegen/compile overhead, not per-row cost.
    if (args.headOption.contains("asof")) {
      val big10 = "/tmp/graft_asof10"
      val reuse = args.drop(1).contains("reuse")
      if (!reuse || !java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$big10/orders.parquet/_SUCCESS"))) {
        val rng = spark.range(10).select(col("id").cast("int").as("copy"))
        // ids shift per copy; user/custkey key space and times stay put —
        // both faces see 10x rows over the same key space (same regime,
        // denser right coverage; identical inputs for the A/B)
        spark.read.parquet(s"$src/events.parquet").crossJoin(rng)
          .withColumn("event_id", col("event_id") + col("copy").cast("long") * 10000000L)
          .drop("copy").repartition(32)
          .write.mode("overwrite").parquet(s"$big10/events.parquet")
        spark.read.parquet(s"$src/orders.parquet").crossJoin(rng)
          .withColumn("o_orderkey", col("o_orderkey") + col("copy").cast("long") * 10000000L)
          .drop("copy").repartition(32)
          .write.mode("overwrite").parquet(s"$big10/orders.parquet")
      }
      def left(dir: String, wide: Boolean): DataFrame = {
        val ev = spark.read.parquet(s"$dir/events.parquet")
        val base = ev.select(col("event_id"), col("user_id"),
          graft.streaming.Streaming.epochSeconds(ev).as("event_s"))
        if (!wide) base
        else (1 to 30).foldLeft(base)((df, i) =>
          df.withColumn(s"payload_$i", col("event_id") * i))
      }
      def right(dir: String): DataFrame = {
        val o = spark.read.parquet(s"$dir/orders.parquet")
        o.select(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("order_s"),
          col("o_orderkey"), col("o_totalprice"))
      }
      def run(face: String, dir: String, wide: Boolean): (Double, Double) = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val l = left(dir, wide); val r = right(dir)
        val t0 = System.nanoTime()
        val joined = face match {
          case "window" => graft.operators.AsOfJoin.backward(l, r,
            "user_id", "o_custkey", "event_s", "order_s",
            rightPayload = Seq("o_orderkey", "o_totalprice"),
            rightTieBreak = Seq("o_orderkey"))
          case "merge" => graft.operators.AsOfJoin.backwardMerge(l, r,
            "user_id", "o_custkey", "event_s", "order_s",
            rightPayload = Seq("o_orderkey", "o_totalprice"),
            rightTieBreak = Seq("o_orderkey"))
        }
        // split driver-side analysis/optimization/planning from execution;
        // consume the JOINED payload, not count(): under count() Catalyst
        // prunes the composed face's whole window away (no window output
        // referenced → ColumnPruning removes Window, then Sort and
        // Exchange) and the "comparison" times a scan-count against the
        // real join — the round-9 7x was exactly that artifact
        joined.queryExecution.executedPlan
        val t1 = System.nanoTime()
        joined.agg(sum(col("o_totalprice")), sum(col("event_id")),
          count(lit(1))).collect()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      if (System.getProperty("graft.asof.stages", "") == "1")
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
            println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d wall=${ms}%5d ms  ${si.name.take(60)}")
          }
        })
      spark.range(1000000).selectExpr("sum(id)").collect()
      println(f"${"cell"}%-24s ${"plan_c"}%7s ${"exec_c"}%7s ${"plan_w"}%7s ${"exec_w"}%7s")
      for {
        (dir, tag) <- Seq((src, "1x"), (big10, "10x"))
        wide <- Seq(false, true)
        face <- Seq("window", "merge")
        aqe <- Seq(true, false)
      } {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        val (pc, ec) = run(face, dir, wide)
        val (pw, ew) = run(face, dir, wide)
        spark.conf.set("spark.sql.adaptive.enabled", true)
        val cell = s"$face/${if (wide) "wide" else "narrow"}/$tag" +
          (if (aqe) "" else "/noaqe")
        println(f"PROBE-ASOF $cell%-30s $pc%7.2f $ec%7.2f $pw%7.2f $ew%7.2f")
      }
      spark.stop()
      return
    }

    // ------------------------------------------------ BM25 A/B (bm25)
    // `runMain graft.ScaleProbe bm25` — index BUILD vs PROBE attribution
    // for lexical retrieval, the split the registered s12 gate (probe
    // face only since round 11) no longer conflates. Four cells per
    // corpus scale: build (writeInvertedIndex), indexed probe
    // (bm25TopKIndexed over the at-rest layout — plan-time
    // partition-pruned), and the in-memory s11 face (bm25TopK — full
    // postings recomputed per query batch) as the baseline the index
    // must beat at scale. Constant-density 10x corpus (cd fixture):
    // fresh text per copy, so postings grow linearly and df stays
    // realistic. Each probe timed twice (cold, warm).
    if (args.headOption.contains("bm25")) {
      val reuse = args.drop(1).contains("reuse")
      val cd = "/tmp/graft_sf1cd"
      ensureFixture(cd, 10, reuse)
      import graft.similarity.Retrieval
      def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      def queries(dir: String) = Retrieval.queryTermsFromText(
        docs(dir).where(col("doc_id") % 100 === 0), "doc_id", "text", nTerms = 5)
      spark.range(1000000).selectExpr("sum(id)").collect()
      for ((dir, tag) <- Seq((src, "1x"), (cd, "10x"))) {
        val idx = s"/tmp/graft_bm25probe_$tag"
        def build(): Double = {
          CacheRegistry.unpersistAll(); spark.catalog.clearCache()
          val t0 = System.nanoTime()
          Retrieval.writeInvertedIndex(docs(dir), "doc_id", "text", idx, buckets = 16)
          (System.nanoTime() - t0) / 1e9
        }
        def probe(face: String): Double = {
          CacheRegistry.unpersistAll(); spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val top = face match {
            case "indexed" =>
              Retrieval.bm25TopKIndexed(spark, idx, queries(dir), k = 5, buckets = 16)
            case "memory" =>
              Retrieval.bm25TopK(docs(dir), queries(dir), "doc_id", "text", k = 5)
          }
          top.agg(sum(col("score")), count(lit(1))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        val b = build()
        val (ic, iw) = (probe("indexed"), probe("indexed"))
        val (mc, mw) = (probe("memory"), probe("memory"))
        println(f"PROBE-BM25 $tag%-4s build=$b%7.2f  indexed_probe(c/w)=$ic%6.2f/$iw%6.2f  " +
          f"memory(c/w)=$mc%6.2f/$mw%6.2f")
      }
      spark.stop()
      return
    }

    // ------------------------------------------- manifest ceiling (manifest)
    // `runMain graft.ScaleProbe manifest` — the graftshard manifest is
    // one driver-resident JSON file with O(files) entries; the scaladoc
    // documents a ~1M-entry ceiling with the Iceberg manifest-list
    // pagination shape named as the upgrade path. This probe VALIDATES
    // that claim before anyone trusts it at 100 TB: synthetic manifests
    // at 10k / 50k / 100k / 1M entries (64 MiB nominal shards: 1M
    // entries ≈ 64 TB; 100 TB at 128 MiB shards ≈ 800k), timing the
    // three driver costs a query actually pays — commit (writeManifest),
    // planning-side read (readManifest), and scan planning (stats
    // skipping over every entry + greedy bin-pack of the survivors).
    // Range-clustered stats so a point predicate prunes ~all files (the
    // production case) and a 50% predicate exercises bin-pack at bulk.
    if (args.headOption.contains("manifest")) {
      import graft.sources.v2.{GraftShardScanBuilder, ShardFormat}
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", LongType, nullable = false)))
      val empty = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())
      for (n <- Seq(10000, 50000, 100000, 1000000)) {
        val dir = s"/tmp/graft_manifest_probe_$n"
        new java.io.File(dir).mkdirs()
        // start clean: the CAS commit protocol refuses to re-claim a
        // version file left by a previous probe run
        Option(new java.io.File(dir).listFiles()).foreach(_.foreach(_.delete()))
        val entries = (0 until n).map { i =>
          ShardFormat.FileEntry(f"part-$i%07d.shard", 64L * 1024 * 1024, 1000L,
            Map("id" -> (i * 1000L, i * 1000L + 999L, 0L),
              "v" -> (0L, 999L, 0L)), Map.empty, None)
        }
        def t[A](body: => A): (A, Double) = {
          val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
        }
        val (_, wSec) = t(ShardFormat.writeManifest(dir, ShardFormat.Manifest(
          schema, "probe", entries, None, version = 1L,
          createdAtMs = System.currentTimeMillis())))
        val (m, rSec) = t(ShardFormat.readManifest(dir).get)
        require(m.files.size == n)
        def plan(filters: Array[org.apache.spark.sql.sources.Filter]): (Int, Double) = {
          val sb = new GraftShardScanBuilder(dir, schema, empty, None)
          sb.pushFilters(filters)
          val (parts, sec) = t(sb.build().toBatch.planInputPartitions())
          (parts.length, sec)
        }
        val (pPoint, pointSec) = plan(Array(
          org.apache.spark.sql.sources.EqualTo("id", n / 2 * 1000L)))
        // segment-pruned plan-time loading (round 13): a selective
        // predicate should PARSE only the segments whose rollups can
        // intersect it — entries loaded is the driver-memory story
        val (prLoaded, prSec) = t(ShardFormat.readManifestForScan(dir,
          r => graft.sources.v2.ShardFilters.mayContain(
            org.apache.spark.sql.sources.EqualTo("id", n / 2 * 1000L), r))
          .get.files.size)
        val (pHalf, halfSec) = plan(Array(
          org.apache.spark.sql.sources.GreaterThan("id", n / 2 * 1000L)))
        val (pAll, allSec) = plan(Array.empty)
        // LEAN filterless planning (round 14): retained driver heap of
        // planning a full-table scan (streams paged segments, keeps lean
        // tuples + partitions) vs the rich intermediate it replaced (the
        // materialized FileEntry list with its stat maps)
        def heapUsed(): Long = {
          System.gc(); Thread.sleep(150)
          java.lang.management.ManagementFactory.getMemoryMXBean
            .getHeapMemoryUsage.getUsed
        }
        val h0 = heapUsed()
        val leanParts = {
          val sb = new GraftShardScanBuilder(dir, schema, empty, None)
          sb.build().toBatch.planInputPartitions()
        }
        val h1 = heapUsed()
        val richEntries = ShardFormat.readManifest(dir).get.files
        val h2 = heapUsed()
        require(leanParts.length == pAll && richEntries.size == n)
        val leanHeapMb = (h1 - h0) / 1e6
        val richHeapMb = (h2 - h1) / 1e6
        // the APPEND commit — the cost paging transforms: one new entry
        // over the provenance-carrying manifest re-serializes only ONE
        // new segment + the root of segment names; the monolithic
        // control (threshold forced past n) re-serializes every entry
        val appended = ShardFormat.FileEntry("part-append.shard",
          64L * 1024 * 1024, 1000L,
          Map("id" -> (n * 1000L, n * 1000L + 999L, 0L), "v" -> (0L, 999L, 0L)),
          Map.empty, None)
        val (_, aPagedSec) = t(ShardFormat.writeManifest(dir,
          m.copy(files = m.files :+ appended, version = m.version + 1)))
        val (_, aMonoSec) = ShardFormat.segmentCapLock.synchronized {
          val prevCap = ShardFormat.segmentMaxEntries
          ShardFormat.segmentMaxEntries = Int.MaxValue
          try t(ShardFormat.writeManifest(dir,
            m.copy(files = m.files :+ appended, version = m.version + 2)))
          finally ShardFormat.segmentMaxEntries = prevCap
        }
        // topN file cut: ORDER BY id DESC LIMIT 100 over the range-
        // disjoint bounds — the cut is an O(files log files) driver sort
        // and must stay planning-speed at the manifest ceiling
        val (pTop, topSec) = {
          import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
          val sb = new GraftShardScanBuilder(dir, schema, empty, None)
          require(sb.pushTopN(Array(Expressions.sort(
            Expressions.column("id"), SortDirection.DESCENDING)), 100),
            "probe: topN push refused")
          val (parts, sec) = t(sb.build().toBatch.planInputPartitions())
          (parts.length, sec)
        }
        // partition evolution worst case: EVERY entry keyed -> every
        // entry copies (partition cleared) -> every paged segment dirty
        // -> a full manifest rewrite. One-time admin cost, priced here.
        val (spN, spSec) = {
          val d2 = s"/tmp/graft_manifest_probe_sp_$n"
          new java.io.File(d2).mkdirs()
          Option(new java.io.File(d2).listFiles()).foreach(_.foreach(_.delete()))
          val keyed = entries.zipWithIndex.map { case (fe, i) =>
            fe.copy(partition = Some(i % 1024L)) }
          ShardFormat.writeManifest(d2, ShardFormat.Manifest(
            schema, "probe", keyed, Some(ShardFormat.IdentityPart("id")),
            version = 1L, createdAtMs = System.currentTimeMillis()))
          val m2 = ShardFormat.readManifest(d2).get
          require(m2.files.size == n)
          val (r, sec) = t(graft.sources.v2.GraftShardMaintenance
            .setPartitioning(d2, None))
          (r.filesCleared, sec)
        }
        println(f"PROBE-MANIFEST n=$n%8d write=$wSec%6.2f read=$rSec%6.2f " +
          f"pruned_read=$prSec%6.3f($prLoaded%d/$n entries) " +
          f"plan_point=$pointSec%6.3f($pPoint%d parts) plan_half=$halfSec%6.3f($pHalf%d) " +
          f"plan_full=$allSec%6.3f($pAll%d) " +
          f"plan_full_lean_heap=$leanHeapMb%.1fMB rich_entries_heap=$richHeapMb%.1fMB " +
          f"plan_topn=$topSec%6.3f($pTop%d) " +
          f"append_paged=$aPagedSec%6.3f append_mono=$aMonoSec%6.2f " +
          f"set_part=$spSec%6.2f($spN%d cleared)")
      }
      spark.stop()
      return
    }

    // ----------------------------------- columnar READ A/B (colread)
    // `runMain graft.ScaleProbe colread` — the batch-read claim as a
    // number: a plain scan decoding v3/v4 groups straight into column
    // vectors vs the same scan forced down the row path
    // (option("columnarRead","false")). Same table, same bytes, same
    // projection — the delta is per-row InternalRow assembly + boxing.
    if (args.headOption.contains("colread")) {
      val dir = "/tmp/graft_colread_probe"
      spark.range(0, 8000000L).select(
        col("id"), (col("id") % 97).cast("int").as("i"),
        (col("id") * 0.5).as("d"),
        concat(lit("sample_text_"), col("id") % 1000).as("s"))
        .repartition(8)
        .write.format("graftshard").mode("overwrite").save(dir)
      def timeScan(label: String, columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(dir)
        // an aggregate over every column defeats aggregate pushdown?
        // no — sum(i)+sum(d) over ALL rows IS manifest-answerable for i
        // but not for d+string; group by nothing with a string function
        // keeps the scan real
        val n = df.select(length(col("s")).as("l"), col("i"), col("d"))
          .agg(sum("l"), sum("i"), sum("d")).collect()
        require(n.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      def timeNumeric(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(dir)
        // sum(d) is a DOUBLE — outside the integral-sums manifest
        // pushdown, so the scan is real in both modes
        require(df.select(col("id"), col("d"))
          .agg(sum("id"), sum("d")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeScan("warm", columnar = true) // JIT + page cache
      val row = timeScan("row", columnar = false)
      val colT = timeScan("columnar", columnar = true)
      val row2 = timeScan("row2", columnar = false)
      val colT2 = timeScan("columnar2", columnar = true)
      timeNumeric(columnar = true)
      val nRow = math.min(timeNumeric(false), timeNumeric(false))
      val nCol = math.min(timeNumeric(true), timeNumeric(true))
      println(f"PROBE-COLREAD rows=8M cols=4 row=${math.min(row, row2)}%6.2f " +
        f"columnar=${math.min(colT, colT2)}%6.2f " +
        f"ratio=${math.min(row, row2) / math.min(colT, colT2)}%5.2f " +
        f"numeric_row=$nRow%6.2f numeric_columnar=$nCol%6.2f " +
        f"numeric_ratio=${nRow / nCol}%5.2f")
      // DICTIONARY-AT-REST scan (round 14): the same string-heavy scan
      // over a compression=dict table — codec-2 chunks stay encoded and
      // the batch serves (dictionary, ids) through
      // WritableColumnVector.setDictionary: each distinct value
      // materializes once per CHUNK, ids fill as 1-2B ints. The row
      // path must reconstruct the raw layout per chunk and copy per
      // cell — this is the text-curation scan shape at rest.
      val ddir = "/tmp/graft_colread_probe_dict"
      spark.range(0, 8000000L).select(
        col("id"), (col("id") % 97).cast("int").as("i"),
        (col("id") * 0.5).as("d"),
        concat(lit("sample_text_"), col("id") % 1000).as("s"))
        .repartition(8)
        .write.format("graftshard").option("compression", "dict")
        .mode("overwrite").save(ddir)
      def timeDict(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(ddir)
        val n = df.select(length(col("s")).as("l"), col("i"), col("d"))
          .agg(sum("l"), sum("i"), sum("d")).collect()
        require(n.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeDict(columnar = true) // JIT + page cache
      val dRow = math.min(timeDict(false), timeDict(false))
      val dCol = math.min(timeDict(true), timeDict(true))
      println(f"PROBE-COLREAD-DICT rows=8M cols=4 row=$dRow%6.2f " +
        f"columnar=$dCol%6.2f ratio=${dRow / dCol}%5.2f")
      // FILTERED scan over the dict table: survivors compact out of
      // dictionary-backed vectors — since round 14 by copying 1-2 B ids
      // (the output vector re-mounts the chunk dictionary), not bytes
      def timeDictFiltered(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(ddir)
        require(df.where(col("i") < 30)
          .select(length(col("s")).as("l"), col("d"))
          .agg(sum("l"), sum("d")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeDictFiltered(columnar = true)
      val dfRow = math.min(timeDictFiltered(false), timeDictFiltered(false))
      val dfCol = math.min(timeDictFiltered(true), timeDictFiltered(true))
      println(f"PROBE-COLREAD-DICT-FILTER rows=8M sel=31%% row=$dfRow%6.2f " +
        f"columnar=$dfCol%6.2f ratio=${dfRow / dfCol}%5.2f")
      // STRING-predicate scan over the dict table (round 14, late): the
      // pushed predicate references exactly one dict-served slot, so
      // the batch path evaluates it on the DICTIONARY DOMAIN — one
      // boolean per distinct value plus an id lookup per row — instead
      // of boxing a UTF8String per row. The curation WHERE lang='en'
      // shape at rest.
      def timeDictStr(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(ddir)
        require(df.where(col("s") < "sample_text_3")
          .select(col("i"), col("d"))
          .agg(sum("i"), sum("d")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeDictStr(columnar = true)
      val dsRow = math.min(timeDictStr(false), timeDictStr(false))
      val dsCol = math.min(timeDictStr(true), timeDictStr(true))
      println(f"PROBE-COLREAD-DICT-STRPRED rows=8M sel~26%% row=$dsRow%6.2f " +
        f"columnar=$dsCol%6.2f ratio=${dsRow / dsCol}%5.2f")
      // FILTERED scan (round 13: absorbed predicates now stay columnar —
      // a selective filter evaluates against the decoded batch and the
      // survivors compact): the shape that dominates a curation pass
      def timeFiltered(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(dir)
        require(df.where(col("i") < 30) // ~31% pass, every group matches some
          .select(length(col("s")).as("l"), col("d"))
          .agg(sum("l"), sum("d")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeFiltered(columnar = true)
      val fRow = math.min(timeFiltered(false), timeFiltered(false))
      val fCol = math.min(timeFiltered(true), timeFiltered(true))
      // clustered predicate (the time-range curation shape): group stats
      // skip the non-matching ranges, boundary groups compact, matching
      // groups expose zero-copy — the all-match fast path's home turf
      def timeClustered(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(dir)
        require(df.where(col("id") < 2400000L)
          .select(length(col("s")).as("l"), col("d"))
          .agg(sum("l"), sum("d")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeClustered(columnar = true)
      val cRow = math.min(timeClustered(false), timeClustered(false))
      val cCol = math.min(timeClustered(true), timeClustered(true))
      // EMBEDDING scan (round 13: array<float> decodes into vector
      // batches): project id + 64-dim embedding, reduce a float
      val edir = "/tmp/graft_colread_probe_emb"
      spark.range(0, 1000000L).select(col("id"),
        org.apache.spark.sql.functions.array(
          (0 until 64).map(j => ((col("id") + j) % 1000).cast("float")): _*).as("emb"))
        .repartition(8)
        .write.format("graftshard").mode("overwrite").save(edir)
      def timeEmb(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(edir)
        require(df.select(element_at(col("emb"), 32).as("x"))
          .agg(sum("x")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeEmb(columnar = true)
      val eRow = math.min(timeEmb(false), timeEmb(false))
      val eCol = math.min(timeEmb(true), timeEmb(true))
      // merge-on-read scan (round 13: DV ordinals deselect batch rows):
      // 25% of rows dead, the post-upsert curation-read shape
      val mdir = "/tmp/graft_colread_probe_mor"
      spark.conf.set("spark.sql.catalog.probecat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.probecat.warehouse", "/tmp/graft_colread_probe_wh")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS probecat.p")
      spark.sql("DROP TABLE IF EXISTS probecat.p.mor")
      spark.range(0, 8000000L).select(
        col("id"), (col("id") % 97).cast("int").as("i"),
        concat(lit("sample_text_"), col("id") % 1000).as("s"))
        .repartition(8).writeTo("probecat.p.mor").using("graftshard").create()
      spark.conf.set("spark.graftshard.rowLevel.mode", "merge-on-read")
      try spark.sql("DELETE FROM probecat.p.mor WHERE id % 4 = 0")
      finally spark.conf.unset("spark.graftshard.rowLevel.mode")
      val _ = mdir
      def timeMor(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString)
          .load("/tmp/graft_colread_probe_wh/p/mor")
        require(df.select(length(col("s")).as("l"), col("i"))
          .agg(sum("l"), sum("i")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeMor(columnar = true)
      val mRow = math.min(timeMor(false), timeMor(false))
      val mCol = math.min(timeMor(true), timeMor(true))
      println(f"PROBE-COLREAD-FILTER rows=8M sel=31%% row=$fRow%6.2f " +
        f"columnar=$fCol%6.2f ratio=${fRow / fCol}%5.2f")
      println(f"PROBE-COLREAD-CLUSTERED rows=8M sel=30%% row=$cRow%6.2f " +
        f"columnar=$cCol%6.2f ratio=${cRow / cCol}%5.2f")
      println(f"PROBE-COLREAD-EMB rows=1M dims=64 row=$eRow%6.2f " +
        f"columnar=$eCol%6.2f ratio=${eRow / eCol}%5.2f")
      println(f"PROBE-COLREAD-MOR rows=8M dead=25%% row=$mRow%6.2f " +
        f"columnar=$mCol%6.2f ratio=${mRow / mCol}%5.2f")
      // TOKEN-ARRAY scan (round 14: array<int>/array<long> at rest —
      // the tokenized-corpus column): project id + a ~32-token id
      // sequence, reduce size + an element, columnar vs row. The batch
      // path decodes each cell with one tight loop into appendInts;
      // the row path pays a stream read per ELEMENT.
      val tdir = "/tmp/graft_colread_probe_tok"
      spark.range(0, 1000000L).select(col("id"),
        org.apache.spark.sql.functions.array(
          (0 until 32).map(j => ((col("id") + j) % 50000).cast("int")): _*).as("toks"))
        .repartition(8)
        .write.format("graftshard").mode("overwrite").save(tdir)
      def timeTok(columnar: Boolean): Double = {
        val t0 = System.nanoTime()
        val df = spark.read.format("graftshard")
          .option("columnarRead", columnar.toString).load(tdir)
        require(df.select(size(col("toks")).as("n"),
          element_at(col("toks"), 16).as("x"))
          .agg(sum("n"), sum("x")).collect().nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      timeTok(columnar = true)
      val tRow = math.min(timeTok(false), timeTok(false))
      val tCol = math.min(timeTok(true), timeTok(true))
      println(f"PROBE-COLREAD-TOKARR rows=1M toks=32 row=$tRow%6.2f " +
        f"columnar=$tCol%6.2f ratio=${tRow / tCol}%5.2f")
      spark.stop()
      return
    }

    // ------------------------------------------- columnar A/B (columnar)
    // `runMain graft.ScaleProbe columnar` — the format-v3 claim as a
    // number: a narrow projection over a WIDE table should cost the
    // wanted columns, not the row width. The v2 control is written by a
    // local encoder replicating the legacy row layout byte for byte
    // (the writer only emits v3 now); same rows, same file count. The
    // win concentrates where v2 hurt most: variable-width (string)
    // columns force a per-row per-field length parse to skip, v3 skips
    // the whole chunk with one call per group.
    if (args.headOption.contains("columnar")) {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      import graft.sources.v2.ShardFormat
      val nStr = 16
      val nLong = 16
      val schema = StructType(
        StructField("id", LongType, nullable = false) +:
          ((0 until nStr).map(i => StructField(s"s$i", StringType, nullable = false)) ++
            (0 until nLong).map(i => StructField(s"l$i", LongType, nullable = false))))
      def wide(rows: Long) = {
        var df = spark.range(0, rows, 1, 32).select(col("id"))
        (0 until nStr).foreach(i => df = df.withColumn(s"s$i",
          concat(lit(s"value_$i" * 3 + "_"), col("id") % 1000)))
        (0 until nLong).foreach(i => df = df.withColumn(s"l$i", col("id") * (i + 1)))
        df
      }
      // local v2 encoder: magic GRFTSHD2, column header, per row a null
      // bitmap then fields in order (all non-null here)
      def writeV2(dir: String, rows: Long): Unit = writeV2Df(dir, wide(rows))
      def writeV2One(dir: String, rows: Long): Unit = writeV2Df(dir, wide(rows).coalesce(1))
      def writeV2Df(dir: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val d = new java.io.File(dir)
        d.mkdirs()
        Option(d.listFiles()).foreach(_.foreach(_.delete()))
        val entries = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
          val name = f"legacy-$pid%05d.shard"
          val f = new java.io.File(dir, name)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 20))
          out.write("GRFTSHD2".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          out.writeShort(schema.fields.length)
          schema.fields.foreach { fl =>
            out.writeByte(if (fl.dataType == LongType) 0 else 5); out.writeUTF(fl.name)
          }
          val bitmapBytes = (schema.fields.length + 7) / 8
          val bitmap = new Array[Byte](bitmapBytes) // all non-null
          var n = 0L
          it.foreach { row =>
            out.write(bitmap)
            var i = 0
            while (i < schema.fields.length) {
              schema.fields(i).dataType match {
                case LongType => out.writeLong(row.getLong(i))
                case _ =>
                  val b = row.getUTF8String(i).getBytes
                  out.writeInt(b.length); out.write(b)
              }
              i += 1
            }
            n += 1
          }
          out.close()
          Iterator((name, f.length(), n))
        }.collect()
        ShardFormat.writeManifest(dir, ShardFormat.Manifest(
          schema, "v2probe",
          entries.toSeq.map { case (n, b, r) =>
            ShardFormat.FileEntry(n, b, r, Map.empty, Map.empty, None) },
          None, version = 1L, createdAtMs = System.currentTimeMillis(),
          operation = "append"))
      }
      def bench(label: String, dir: String): Unit = {
        def t(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        def scan = spark.read.format("graftshard").load(dir)
        // warm once (page cache parity), then min of 3
        def run(df: => org.apache.spark.sql.DataFrame): Double = {
          df.collect(); (1 to 3).map(_ => t(df.collect(): Unit)).min
        }
        // id + l7 (an expression) so the SUM manifest pushdown cannot
        // answer it — this must measure DECODE, not metadata
        val proj = run(scan.agg(sum(col("id") + col("l7"))))
        val one  = run(scan.agg(sum(length(col("s7")))))
        val fullAggs = Seq(sum(col("id"))) ++
          (0 until nStr).map(i => sum(length(col(s"s$i")))) ++
          (0 until nLong).map(i => sum(col(s"l$i")))
        val full = run(scan.agg(fullAggs.head, fullAggs.tail: _*))
        println(f"PROBE-COLUMNAR $label proj2=$proj%6.3f oneStr=$one%6.3f full=$full%6.3f")
      }
      for ((rows, tag) <- Seq((1000000L, "1x"), (10000000L, "10x"))) {
        val v3dir = s"/tmp/graft_columnar_v3_$tag"
        val v2dir = s"/tmp/graft_columnar_v2_$tag"
        wide(rows).write.format("graftshard").mode("overwrite").save(v3dir)
        writeV2(v2dir, rows)
        bench(s"v3/$tag rows=$rows", v3dir)
        bench(s"v2/$tag rows=$rows", v2dir)
      }
      // group-skip cell: ONE sorted 2M-row file (~1.3 GB, the inside of
      // a real shard), a 1% id range absorbed by the source — v3 drops
      // whole groups from the header stats, v2 must length-parse every
      // row to apply the same filter. Single file on purpose: manifest
      // file-skipping is the SAME for both (one file), so the delta is
      // group skipping alone.
      locally {
        val rows = 2000000L
        val lo = rows / 2
        val hi = lo + rows / 100
        val v3dir = "/tmp/graft_columnar_gskip_v3"
        val v2dir = "/tmp/graft_columnar_gskip_v2"
        wide(rows).coalesce(1).write.format("graftshard").mode("overwrite").save(v3dir)
        writeV2One(v2dir, rows)
        def t(dir: String): Double = {
          def q = spark.read.format("graftshard").load(dir)
            .where(col("id") >= lo && col("id") < hi)
            .agg(sum(col("id") + col("l7")), sum(length(col("s7"))))
          q.collect(); (1 to 3).map { _ =>
            val t0 = System.nanoTime(); q.collect(); (System.nanoTime() - t0) / 1e9
          }.min
        }
        println(f"PROBE-COLUMNAR gskip(1%% of 2M, 1 sorted file) v3=${t(v3dir)}%6.3f v2=${t(v2dir)}%6.3f")
      }
      // compression cell: REAL text (documents sf0.1 replicated 50×
      // with the cd builder's per-copy whitespace token salt, so deflate
      // cannot exploit cross-copy duplicates). compression=deflate is
      // OPT-IN: bytes are the 100 TB claim (storage AND the ranged GETs
      // a scan issues); the fullscan delta is the inflate tax, and
      // skiptext shows skipping works the same on compressed chunks
      // (skips count COMPRESSED bytes).
      locally {
        val rng = spark.range(50).select(col("id").cast("int").as("copy"))
        val docs = spark.read.parquet(s"$src/documents.parquet").crossJoin(rng)
          .withColumn("doc_id", col("doc_id") + col("copy").cast("long") * 10000000L)
          .withColumn("text", regexp_replace(col("text"),
            lit("(^|[ \\t\\n\\x0B\\f\\r])"), concat(lit("$1c"), col("copy"), lit("_"))))
          .select("doc_id", "text", "lang", "source", "n_chars")
          .repartition(8)
        val zdir = "/tmp/graft_columnar_txt_deflate"
        val rdir = "/tmp/graft_columnar_txt_raw"
        docs.write.format("graftshard").option("compression", "deflate")
          .mode("overwrite").save(zdir)
        docs.write.format("graftshard").mode("overwrite").save(rdir)
        def bytesOf(dir: String): Long =
          graft.sources.v2.ShardFormat.readManifest(dir).get.files.map(_.bytes).sum
        def t(dir: String, full: Boolean): Double = {
          def q = {
            val s0 = spark.read.format("graftshard").load(dir)
            if (full) s0.agg(sum(length(col("text"))), sum(col("n_chars")))
            else s0.agg(sum(col("n_chars") + col("doc_id"))) // text chunk skipped
          }
          q.collect(); (1 to 3).map { _ =>
            val t0 = System.nanoTime(); q.collect(); (System.nanoTime() - t0) / 1e9
          }.min
        }
        println(f"PROBE-COLUMNAR text(50x salted sf0.1 docs) bytes deflate=${bytesOf(zdir)}%d " +
          f"raw=${bytesOf(rdir)}%d ratio=${bytesOf(rdir).toDouble / bytesOf(zdir)}%4.2f " +
          f"fullscan deflate=${t(zdir, full = true)}%6.3f raw=${t(rdir, full = true)}%6.3f " +
          f"skiptext deflate=${t(zdir, full = false)}%6.3f raw=${t(rdir, full = false)}%6.3f")
        // dictionary cell: compression=dict targets the LOW-CARDINALITY
        // string columns (lang, source — the skipping/filter currency)
        // with a byte-copy decode, i.e. none of deflate's inflate tax.
        // lowcard scans only lang+source chunks — where dict pays; full
        // is the whole-width tax (text stays raw under dict: diverse
        // text is not dictionary-shaped, the encoder bails per chunk).
        val ddir = "/tmp/graft_columnar_txt_dict"
        docs.write.format("graftshard").option("compression", "dict")
          .mode("overwrite").save(ddir)
        def tl(dir: String): Double = {
          def q = spark.read.format("graftshard").load(dir)
            .groupBy(col("lang"), col("source")).count()
          q.collect(); (1 to 3).map { _ =>
            val t0 = System.nanoTime(); q.collect(); (System.nanoTime() - t0) / 1e9
          }.min
        }
        println(f"PROBE-COLUMNAR dict bytes dict=${bytesOf(ddir)}%d raw=${bytesOf(rdir)}%d " +
          f"deflate=${bytesOf(zdir)}%d " +
          f"lowcard dict=${tl(ddir)}%6.3f raw=${tl(rdir)}%6.3f deflate=${tl(zdir)}%6.3f " +
          f"fullscan dict=${t(ddir, full = true)}%6.3f raw=${t(rdir, full = true)}%6.3f")
      }
      spark.stop()
      return
    }

    // ------------------------------------------- row-level A/B (rowlevel)
    // `runMain graft.ScaleProbe rowlevel` — copy-on-write vs
    // merge-on-read for the SAME selective unaligned DELETE (~1% of
    // rows, no file provably all-in/out), plus each mode's read tax
    // after the delete and the compaction cost that purges MoR
    // vectors. The claim under test: MoR's commit cost tracks the
    // DELETED volume (KB sidecars) where CoW's tracks the CANDIDATE
    // volume (every matched file rewritten) — the gap should widen
    // with corpus scale while reads stay near-par.
    if (args.headOption.contains("rowlevel")) {
      val reuse = args.drop(1).contains("reuse")
      val cd = "/tmp/graft_sf1cd"
      ensureFixture(cd, 10, reuse)
      spark.conf.set("spark.sql.catalog.rlprobe", "graft.sources.v2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.rlprobe.warehouse", "/tmp/graft_rlprobe_wh")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS rlprobe.p")
      spark.range(1000).selectExpr("sum(id)").collect()
      def t(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val cd100 = "/tmp/graft_cd100_x100"
      ensureFixture(cd100, 100, reuse)
      // warm the whole pipeline (plan shapes, codegen, codec JIT) on a
      // throwaway cell so the measured 1x cells are not JIT-confounded
      var warming = true
      for (pass <- Seq("warm", "measure");
           (dir, tag) <- (if (warming) Seq((src, "1x"))
                          else Seq((src, "1x"), (cd, "10x"), (cd100, "100x")));
           mode <- Seq("copy-on-write", "merge-on-read")) {
        val tbl = s"rlprobe.p.t_${pass}_${tag}_${mode.take(4).replace('-', '_')}"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"), col("n_chars"))
          .repartitionByRange(32, col("doc_id"))
          .writeTo(tbl).using("graftshard").create()
        val nRows = spark.table(tbl).count()
        spark.conf.set("spark.graftshard.rowLevel.mode", mode)
        val del = t(spark.sql(s"DELETE FROM $tbl WHERE doc_id % 101 = 5"))
        spark.conf.unset("spark.graftshard.rowLevel.mode")
        val read = t(spark.table(tbl)
          .agg(sum(length(col("text"))), count(lit(1))).collect())
        val comp = t(graft.sources.v2.GraftShardMaintenance
          .compact(spark, s"/tmp/graft_rlprobe_wh/p/${tbl.split('.').last}"))
        if (!warming)
          println(f"PROBE-ROWLEVEL $tag%-5s $mode%-14s rows=$nRows%9d delete=$del%6.2f " +
            f"read_after=$read%6.2f compact=$comp%6.2f")
        if (pass == "warm" && mode == "merge-on-read") warming = false
      }
      spark.stop()
      return
    }

    // ------------------------------------------- upsert A/B (upsert)
    // `runMain graft.ScaleProbe upsert` — the equality-delete claim as
    // a number: merging a CDC batch (~1% of keys, changed values) into
    // a table as ONE upsert commit (insert files + exact-key sidecar,
    // O(batch)) vs the copy-on-write UPDATE of the same keys (the
    // rewrite path — scans candidates, rewrites files, O(touched
    // files)). Then the read-side tax the upsert defers (full-scan
    // aggregate before/after) and the compaction that retires it.
    if (args.headOption.contains("upsert")) {
      val reuse = args.drop(1).contains("reuse")
      val cd = "/tmp/graft_sf1cd"
      ensureFixture(cd, 10, reuse)
      spark.conf.set("spark.sql.catalog.upprobe", "graft.sources.v2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.upprobe.warehouse", "/tmp/graft_upprobe_wh")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS upprobe.p")
      def t(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      var warming = true
      for (pass <- Seq("warm", "measure");
           (dir, tag) <- if (warming) Seq((src, "1x")) else Seq((src, "1x"), (cd, "10x"))) {
        def mk(kind: String): (String, String) = {
          val tbl = s"upprobe.p.t_${pass}_${tag}_$kind"
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text"), col("n_chars"))
            .repartitionByRange(32, col("doc_id"))
            .writeTo(tbl).using("graftshard").create()
          (tbl, s"/tmp/graft_upprobe_wh/p/${tbl.split('.').last}")
        }
        val (cowTbl, _) = mk("cow")
        val (_, upDir) = mk("up")
        val batch = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("doc_id") % 101 === 5)
          .select(col("doc_id"), col("text"), (col("n_chars") + 1).as("n_chars"))
        batch.count() // materialize the source side out of the timing
        val cow = t(spark.sql(
          s"UPDATE $cowTbl SET n_chars = n_chars + 1 WHERE doc_id % 101 = 5"))
        val up = t(batch.coalesce(4).write.format("graftshard")
          .mode("append").option("upsertKey", "doc_id").save(upDir))
        val readTaxed = t(spark.read.format("graftshard").load(upDir)
          .agg(sum(length(col("text"))), count(lit(1))).collect())
        val comp = t(graft.sources.v2.GraftShardMaintenance.compact(spark, upDir))
        val readClean = t(spark.read.format("graftshard").load(upDir)
          .agg(sum(length(col("text"))), count(lit(1))).collect())
        if (!warming)
          println(f"PROBE-UPSERT $tag%-4s cow_update=$cow%6.2f upsert_commit=$up%6.2f " +
            f"read_taxed=$readTaxed%6.2f compact=$comp%6.2f read_clean=$readClean%6.2f")
        if (pass == "warm") warming = false
      }
      spark.stop()
      return
    }

    // ------------------------------------------------ SPJ A/B (spj)
    // `runMain graft.ScaleProbe spj` — the graftshard keyed layout vs the
    // SAME data in unkeyed graftshard tables, on the x43 window workload
    // (running aggregates per shard_key over full-width rows incl. text).
    // The window carries the ENTIRE row volume: unkeyed it shuffles the
    // whole corpus to cluster by key, keyed the ClusteredDistribution is
    // satisfied from storage and only the per-partition sort remains.
    // Identical format/codec on both sides — the A/B isolates the
    // exchange, nothing else. 1x and 10x constant-density corpora; each
    // cell timed twice (cold, warm).
    if (args.headOption.contains("spj")) {
      val reuse = args.drop(1).contains("reuse")
      val cd = "/tmp/graft_sf1cd"
      val cd100 = "/tmp/graft_cd100_x100"
      ensureFixture(cd, 10, reuse)
      ensureFixture(cd100, 100, reuse)
      def buildShard(srcDir: String, out: String, keyed: Boolean): Unit =
        if (!reuse || !java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$out/_graft_manifest.json"))) {
          val df = spark.read.parquet(s"$srcDir/documents.parquet")
            .select(col("doc_id"), col("n_chars"), col("text"),
              pmod(col("doc_id"), lit(32)).as("shard_key"))
            .repartition(col("shard_key"))
          val w = df.write.format("graftshard").mode("overwrite")
          (if (keyed) w.option("partitionKey", "shard_key") else w).save(out)
        }
      val cells = for {
        (srcDir, tag) <- Seq((src, "1x"), (cd, "10x"), (cd100, "100x"))
        keyed <- Seq(true, false)
      } yield {
        val out = s"/tmp/graft_spj_${tag}_${if (keyed) "keyed" else "plain"}"
        buildShard(srcDir, out, keyed)
        (out, tag, keyed)
      }
      def run(dir: String): (Double, Double) = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard_key")).orderBy(col("doc_id"))
          .rowsBetween(Long.MinValue, 0)
        // equal SCAN parallelism on both sides: the keyed read is pinned
        // at 32 key groups, the plain read would otherwise bin-pack into
        // size/128MiB tasks and the A/B would measure parallelism, not
        // the exchange
        val df = spark.read.format("graftshard")
          .option("targetPartitionBytes", (1L << 20).toString).load(dir)
          .select(col("doc_id"), col("shard_key"), col("text"),
            sum(col("n_chars")).over(w).as("run_chars"))
        df.queryExecution.executedPlan
        val t0 = System.nanoTime()
        // consume text THROUGH the window so the exchange (when there is
        // one) carries the real row width, not a pruned 3-long skeleton
        df.agg(sum(length(col("text"))), sum(col("run_chars")), count(lit(1))).collect()
        (0.0, (System.nanoTime() - t0) / 1e9)
      }
      spark.range(1000000).selectExpr("sum(id)").collect()
      // this box spreads ±40% run-to-run (NOTES.md); one cold + min of
      // three warms per cell is the comparable per-cell number
      println(f"${"cell"}%-18s ${"cold"}%7s ${"warm_min3"}%9s")
      cells.foreach { case (out, tag, keyed) =>
        val (_, c) = run(out)
        val wrm = (1 to 3).map(_ => run(out)._2).min
        val cell = s"${if (keyed) "keyed" else "plain"}/$tag"
        println(f"PROBE-SPJ $cell%-18s $c%7.2f $wrm%9.2f")
      }
      spark.stop()
      return
    }

    // ------------------------------------------ bucketed join A/B (spjjoin)
    // `runMain graft.ScaleProbe spjjoin` — the x44 scale claim measured:
    // documents ⋈ embeddings row-level ON RAW IDS, both corpora carrying
    // their full payload (text, float vectors) through the join. Bucketed
    // tables (GraftCatalog, bucket(32, id)) plan the SMJ with ZERO
    // exchange; the plain variant shuffles BOTH corpora. Broadcast
    // disabled — the 100 TB shape is two large sides.
    if (args.headOption.contains("spjjoin")) {
      val reuse = args.drop(1).contains("reuse")
      val cd = "/tmp/graft_sf1cd"
      val cd100 = "/tmp/graft_cd100_x100"
      ensureFixture(cd, 10, reuse)
      ensureFixture(cd100, 100, reuse)
      spark.conf.set("spark.sql.catalog.spjcat", "graft.sources.v2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.spjcat.warehouse", "/tmp/graft_spjjoin_wh")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.j")
      def ensureTables(srcDir: String, tag: String): (String, String, String, String) = {
        val (bd, be, pd, pe) = (s"bdocs_$tag", s"bembs_$tag", s"pdocs_$tag", s"pembs_$tag")
        // freshness = ALL FOUR tables hold rows: CREATE TABLE writes an
        // (empty) manifest before its INSERT runs, so manifest presence
        // alone would serve a partially-built fixture — the skewed-ratio
        // failure the ensureFixture note documents
        def populated(t: String): Boolean =
          graft.sources.v2.ShardFormat.readManifest(s"/tmp/graft_spjjoin_wh/j/$t")
            .exists(_.files.nonEmpty)
        if (!reuse || !Seq(bd, be, pd, pe).forall(populated)) {
          spark.read.parquet(s"$srcDir/documents.parquet")
            .createOrReplaceTempView(s"src_docs_$tag")
          spark.read.parquet(s"$srcDir/embeddings.parquet")
            .createOrReplaceTempView(s"src_embs_$tag")
          for ((t, keyed) <- Seq((bd, true), (pd, false))) {
            spark.sql(s"DROP TABLE IF EXISTS spjcat.j.$t")
            spark.sql(s"""CREATE TABLE spjcat.j.$t (doc_id BIGINT, n_chars BIGINT, text STRING)
              USING graftshard ${if (keyed) "PARTITIONED BY (bucket(32, doc_id))" else ""}""")
            spark.sql(s"INSERT INTO spjcat.j.$t SELECT doc_id, n_chars, text FROM src_docs_$tag")
          }
          for ((t, keyed) <- Seq((be, true), (pe, false))) {
            spark.sql(s"DROP TABLE IF EXISTS spjcat.j.$t")
            spark.sql(s"""CREATE TABLE spjcat.j.$t (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)
              USING graftshard ${if (keyed) "PARTITIONED BY (bucket(32, vec_id))" else ""}""")
            spark.sql(s"INSERT INTO spjcat.j.$t SELECT vec_id, cast(embedding AS ARRAY<FLOAT>), label FROM src_embs_$tag")
          }
        }
        (bd, be, pd, pe)
      }
      def run(docs: String, embs: String): Double = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val df = spark.sql(s"""
          SELECT sum(n_chars) AS sc, sum(length(text)) AS st,
                 sum(element_at(embedding, 1)) AS se, sum(label) AS sl, count(*) AS n
          FROM spjcat.j.$docs d JOIN spjcat.j.$embs e ON d.doc_id = e.vec_id""")
        df.queryExecution.executedPlan
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }
      spark.range(1000000).selectExpr("sum(id)").collect()
      println(f"${"cell"}%-18s ${"cold"}%7s ${"warm_min3"}%9s")
      for ((srcDir, tag) <- Seq((src, "1x"), (cd, "10x"), (cd100, "100x"))) {
        val (bd, be, pd, pe) = ensureTables(srcDir, tag)
        for ((docs, embs, kind) <- Seq((bd, be, "bucketed"), (pd, pe, "plain"))) {
          val c = run(docs, embs)
          val w = (1 to 3).map(_ => run(docs, embs)).min
          println(f"PROBE-SPJJOIN $kind/$tag%-12s $c%7.2f $w%9.2f")
        }
      }
      spark.stop()
      return
    }

    // ------------------------------------------- 100x rehearsal (cd100)
    // `runMain graft.ScaleProbe cd100` — two DECADES of constant-density
    // growth (sf0.1 → ~sf1 → ~sf10) for the headline scale claims, so the
    // linearity story rests on 1x/10x/100x measurements instead of a
    // single-decade extrapolation. Note two registered queries derive
    // their query/increment sets from the corpus (s12: every 100th doc,
    // d11: mutated %5 docs), so their work grows with the corpus BY QUERY
    // DESIGN — production holds those sets fixed; the measured ratios are
    // the conservative upper bound. d8 at 100x needs a bigger driver
    // heap: SPARK_DRIVER_MEM=48g (winnowing explode over ~200M chars).
    if (args.headOption.contains("cd100")) {
      val rehearsal = Seq("d3_dedup_minhash_lsh", "s9_ann_ivf_indexed",
        "s12_bm25_indexed", "d11_dedup_incremental_registry",
        "p2_shuffle_shard", "p3_pack_sequences",
        // dedup tail: d2's 10xCD measured 1.2x (prefix filtering kills
        // disjoint-shingle candidates) — the second decade confirms the
        // exact join stays output-tracking; d8 is linear in BYTES (salt
        // overhead included in the fixture's char count)
        "d2_dedup_ngram_jaccard", "d8_dedup_substring")
      val (sel, reuse) = selectProbes("cd100", rehearsal)
      val cd10 = "/tmp/graft_cd100_x10"
      val cd100 = "/tmp/graft_cd100_x100"
      ensureFixture(cd10, 10, reuse)
      ensureFixture(cd100, 100, reuse)
      spark.range(1000000).selectExpr("sum(id)").collect()
      sel.foreach(n => time(src, n)) // JIT warm
      println(f"${"query"}%-30s ${"1x_sec"}%8s ${"10x_sec"}%8s ${"100x_sec"}%9s ${"r10"}%6s ${"r100"}%6s")
      sel.foreach { n =>
        val t1 = time(src, n)
        val t10 = time(cd10, n)
        val t100 = time(cd100, n)
        println(f"PROBE-CD100 $n%-30s $t1%8.2f $t10%8.2f $t100%9.2f ${t10 / t1}%6.1f ${t100 / t10}%6.1f")
      }
      spark.stop()
      return
    }

    // ---------------------------------------------- constant-density mode
    // `runMain graft.ScaleProbe cd` — the standard 10x fixtures clone every
    // table over the SAME key/time/term space, so pair-emitting operators
    // (near-dup, interval overlap, retrieval) see their OUTPUT grow
    // ~quadratically: a probe ARTIFACT, not how corpora really grow. Real
    // growth adds new documents/time at roughly constant duplicate/overlap
    // density. This mode builds fixtures that grow that way — each copy's
    // tokens are salted (disjoint shingle/term spaces across copies) and
    // each copy's time range is shifted past the previous one (disjoint
    // spans) — so the measured ratio tests the LINEARITY CLAIM instead of
    // the output-growth artifact.
    if (args.headOption.contains("cd")) {
      val cdProbes = Seq("x36_interval_overlap", "d15_dedup_keep_best",
        "s11_bm25_topk", "s12_bm25_indexed", "d16_dup_source_matrix",
        // round-8 additions: the remaining >3x same-span rows, measured
        // under constant density instead of classified by argument
        "d2_dedup_ngram_jaccard", "d5_dedup_embedding_cosine",
        "d7_semantic_dedup", "d8_dedup_substring", "x10_range_join",
        "m4_resize",
        // round-10 addition: the banded hyperplane-LSH face — candidate
        // volume must track near-dup density (cd fixture: cross-copy
        // cosines scramble to ~0, so buckets stay copy-local)
        "d18_embedding_lsh")
      val (selectedCd, reuse) = selectProbes("cd", cdProbes)
      val cd = "/tmp/graft_sf1cd"
      if (!reuse || !java.nio.file.Files.exists(
          // _SUCCESS of the LAST table written — see ensureFixture note
          java.nio.file.Paths.get(s"$cd/lineitem.parquet/_SUCCESS"))) {
        // documents + embeddings from the shared builder; orders/lineitem
        // are cd-specific: copies' TIME ranges shift past each other
        // (~7 TPC-H years per copy) so spans are disjoint and overlap
        // density stays constant
        buildCdCore(cd, 10)
        for ((t, key, ts) <- Seq(("orders", "o_orderkey", "o_orderdate"),
            ("lineitem", "l_orderkey", "l_shipdate"))) {
          val base = spark.read.parquet(s"$src/$t.parquet")
          val rng = spark.range(10).select(col("id").cast("int").as("copy"))
          base.crossJoin(rng)
            .withColumn(key, col(key) + col("copy").cast("long") * 10000000L)
            // ~7 TPC-H years per copy: spans disjoint, density constant
            .withColumn(ts, expr(s"$ts + copy * INTERVAL 2557 DAYS"))
            .drop("copy")
            .repartition(32) // multi-file layout (see buildCdCore note)
            .write.mode("overwrite").parquet(s"$cd/$t.parquet")
        }
      }
      val docs = spark.read.parquet(s"$src/documents.parquet")
      spark.range(1000000).selectExpr("sum(id)").collect()
      selectedCd.foreach(n => time(src, n)) // JIT warm
      println(f"${"query"}%-26s ${"1x_sec"}%8s ${"10xCD_sec"}%9s ${"ratio"}%6s")
      selectedCd.foreach { n =>
        val t1 = time(src, n)
        val t10 = time(cd, n)
        println(f"PROBE-CD $n%-26s $t1%8.2f $t10%9.2f ${t10 / t1}%6.1f")
      }
      // BM25 worst case: every query leads with ultra-common terms whose
      // posting lists are the whole corpus; maxDfFraction is the
      // documented mitigation — measure it instead of arguing it.
      val stop = "/tmp/graft_stopheavy"
      docs.withColumn("text",
          concat(lit("sw1 sw2 sw3 "), coalesce(col("text"), lit(""))))
        .write.mode("overwrite").parquet(s"$stop/documents.parquet")
      val sdocs = spark.read.parquet(s"$stop/documents.parquet")
      def bm25Time(frac: Double): Double = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.similarity.Retrieval.bm25TopK(sdocs,
          graft.similarity.Retrieval.queryTermsFromText(
            sdocs.where(col("doc_id") % 100 === 0), "doc_id", "text", nTerms = 5),
          "doc_id", "text", k = 5, maxDfFraction = frac).count()
        (System.nanoTime() - t0) / 1e9
      }
      bm25Time(1.0) // warm
      val off = bm25Time(1.0)
      val on = bm25Time(0.5)
      println(f"PROBE-BM25-STOPWORDS off(1.0)=$off%.2f s on(0.5)=$on%.2f s speedup=${off / on}%.1fx")
      // SemDeDup at constant CLUSTER SIZE: the registered d7 pins nlist=8,
      // so a 10x corpus grows every cluster 10x and scored pairs 100x —
      // the fixed-parameter artifact, not the operator's scale shape.
      // Production scales nlist with the corpus (fixed expected cluster
      // size, Abbas et al. 2023 run ~50k clusters): pairs then grow
      // LINEARLY. Measure that directly: nlist 8 at 1x vs 80 at 10xCD.
      def semTime(dir: String, nlist: Int): Double = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.dedup.Dedup.semanticDedupPairs(
          spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", "embedding", nlist = nlist, threshold = 0.4).count()
        (System.nanoTime() - t0) / 1e9
      }
      semTime(src, 8) // warm
      val sem1 = semTime(src, 8)
      val sem10 = semTime(cd, 80)
      println(f"PROBE-SEMDEDUP-CONST-CLUSTER 1x(nlist=8)=$sem1%.2f s " +
        f"10xCD(nlist=80)=$sem10%.2f s ratio=${sem10 / sem1}%.1fx")
      // d18's banded hyperplane LSH at constant band WIDTH: random
      // (cross-copy, ~orthogonal) pairs collide in >= 1 of 8 bands with
      // 1-(1-2^-b)^8 — at the registered b=4 that floor is ~40%, so
      // candidates grow QUADRATICALLY with the corpus (the registered cd
      // row measures that artifact). The scale law is b ~ log2(N) bits
      // per band (expected bucket size O(1) -> per-band candidates
      // linear; the minhash-LSH band key avoids the floor the same way,
      // by hashing r minhashes into a 64-bit space). Measure pinned
      // b=4 vs corpus-scaled b (7 at 1x -> 10 at 10x: +log2(10)), noting
      // the scaled path's sharper S-curve targets high-similarity pairs
      // — the production regime for near-dup thresholds.
      def lshTime(dir: String, rowsPerBand: Int): Double = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.dedup.Dedup.embeddingLshPairs(
          spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", "embedding", bands = 8, rowsPerBand = rowsPerBand,
          dims = 64, threshold = 0.4).count()
        (System.nanoTime() - t0) / 1e9
      }
      lshTime(src, 7) // warm
      val lp1 = lshTime(src, 4)
      val lp10 = lshTime(cd, 4)
      val ls1 = lshTime(src, 7)
      val ls10 = lshTime(cd, 10)
      println(f"PROBE-D18-BAND-BITS pinned(b=4) 1x=$lp1%.2f s 10xCD=$lp10%.2f s " +
        f"ratio=${lp10 / lp1}%.1fx; scaled(b=7->10) 1x=$ls1%.2f s 10xCD=$ls10%.2f s " +
        f"ratio=${ls10 / ls1}%.1fx")
      // the AUTO face's law, measured on CANDIDATE VOLUME directly:
      // rowsPerBand = ceil(log2(n)) + 2 must keep candidates ~linear in
      // the corpus (ratio ~10 at 10x), where a width pinned at the 1x
      // value leaves the random-collision floor quadratic (~100x). The
      // banding relation is counted WITHOUT the cosine verify, so the
      // row prices the floor itself, not the rescue.
      def lshCands(dir: String, rowsPerBand: Int): Long = {
        CacheRegistry.unpersistAll(); spark.catalog.clearCache()
        val banded = graft.dedup.Dedup.embeddingLshBands(
          spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", "embedding", bands = 8, rowsPerBand = rowsPerBand, dims = 64)
          .transform(CacheRegistry.persisted(_))
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
              && col("a.id") < col("b.id"))
          .select(col("a.id"), col("b.id")).distinct().count()
      }
      def autoWidth(dir: String): Int = {
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt + 2
      }
      val (w1, w10) = (autoWidth(src), autoWidth(cd))
      val ca1 = lshCands(src, w1)
      val ca10 = lshCands(cd, w10)
      val cp10 = lshCands(cd, w1) // the 1x width cargo-culted to 10x
      println(f"PROBE-LSH-AUTO cands auto(b=$w1->$w10) 1x=$ca1%d 10xCD=$ca10%d " +
        f"ratio=${ca10.toDouble / math.max(1L, ca1)}%.1fx; " +
        f"pinned(b=$w1) 10xCD=$cp10%d ratio=${cp10.toDouble / math.max(1L, ca1)}%.1fx")
      spark.stop()
      return
    }

    replicate("lineitem", Seq("l_orderkey"), None)
    replicate("orders", Seq("o_orderkey"), None)
    replicate("documents", Seq("doc_id"), Some("text"))
    replicate("embeddings", Seq("vec_id"), None)
    spark.read.parquet(s"$src/customer.parquet").write.mode("overwrite")
      .parquet(s"$big/customer.parquet")
    spark.read.parquet(s"$src/nation.parquet").write.mode("overwrite")
      .parquet(s"$big/nation.parquet")
    // events replicate with shifted ids but UNSHIFTED timestamps: 10x the
    // rows land in the same hour/window key space, which is exactly the
    // claim the window probes (x24/st5/x25) need to test
    replicate("events", Seq("event_id", "user_id"), None)

    val probes = Seq("q1_flagship", "d1_dedup_exact", "d2_dedup_ngram_jaccard",
      "d3_dedup_minhash_lsh", "d4_dedup_simhash", "d5_dedup_embedding_cosine",
      "d6_dedup_clusters", "s1_ann_bruteforce_topk", "s2_ann_lsh_topk",
      "s3_ann_ivf", "s4_ann_ivf_kmeans", "x1_star_join", "x2_asof_join",
      "x4_window_running", "x7_salted_distinct", "x10_range_join",
      "t9_repetition", "t10_heuristic_filter", "t11_pii_redaction",
      "t12_decontamination", "p2_shuffle_shard", "p3_pack_sequences",
      "p4_mixture_sample", "st4_minhash_band_registry",
      "d8_dedup_substring", "s5_ann_sq8", "t14_model_filter",
      "t15_decontamination_bloom", "p5_curriculum", "m5_perceptual_dedup",
      "p6_tokenize_ids", "a2_hll_union", "x19_rank_family", "t16_lm_perplexity",
      "d9_line_dedup", "p7_source_quota", "x20_skew_join", "a3_kll_quantiles",
      "s6_ann_recall", "t17_normalize_dedup",
      "p8_bpe_train", "t18_decontamination_fuzzy", "a4_cms_frequency",
      "p10_chunk_docs", "x21_zorder_interleave", "x24_range_frame_window",
      "st5_sliding_windows", "x23_stats_corr",
      "x25_gap_fill", "x26_cdc_merge", "x28_funnel", "x29_retention",
      "x32_reconcile", "d10_line_dedup_within", "p11_hash_split",
      "st6_latest_state", "t19_winsorize",
      "m4_resize", "m6_video_decode", "t21_model_filter_trained",
      "p12_mixture_upsample", "p13_length_buckets",
      "m9_frame_extract", "m10_media_sniff", "t22_html_extract",
      "t23_url_features", "x33_scd2_history", "s7_ann_pq",
      "d13_paragraph_near_dedup", "m11_zip_shards", "t26_gunzip_text",
      "m12_audio_resample", "m13_patchify", "t27_sentences", "p14_sentence_chunks",
      "s8_hard_negatives", "t28_dsir", "t29_compression_ratio",
      "x34_pagerank", "x35_jsonl_roundtrip", "d14_sentence_dedup",
      "s9_ann_ivf_indexed", "p15_temperature_mixture", "s10_ann_lsh_indexed",
      "s11_bm25_topk", "s12_bm25_indexed", "p16_fim", "t30_blocklist",
      "t31_nfc_normalize", "m14_scene_cuts",
      "t32_url_dedup", "t33_decontaminate_spans", "t34_stupid_backoff",
      "x36_interval_overlap", "p17_weighted_sample", "p18_chat_template",
      "s13_random_projection",
      "t35_readability", "d15_dedup_keep_best", "m15_channel_stats",
      "p19_unigram_train", "p20_unigram_encode",
      "t36_line_prevalence", "a5_source_overlap", "p21_pack_boundaries",
      "x37_orc_roundtrip",
      "d16_dup_source_matrix", "st7_windowed_heavy_hitters", "m16_energy_segments",
      "p22_bpe_artifact_roundtrip", "p23_unigram_artifact_roundtrip",
      "d17_semantic_dedup_scaled")
    // optional args = probe-name filter (run a subset while iterating);
    // unknown names fail loudly — a typo must not look like a clean run
    val unknown = args.toSet -- probes.toSet
    require(unknown.isEmpty, s"ScaleProbe: unknown probe name(s): ${unknown.mkString(", ")}")
    val selected = if (args.isEmpty) probes else probes.filter(args.toSet)
    // warmup (JIT/classloading only; caches cleared per timed run)
    spark.range(1000000).selectExpr("sum(id)").collect()
    selected.foreach(n => time(src, n))
    println(f"${"query"}%-26s ${"1x_sec"}%8s ${"10x_sec"}%8s ${"ratio"}%6s")
    selected.foreach { n =>
      val t1 = time(src, n)
      val t10 = time(big, n)
      println(f"PROBE $n%-26s $t1%8.2f $t10%8.2f ${t10 / t1}%6.1f")
    }
    spark.stop()
  }
}
