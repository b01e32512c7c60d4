package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** The batch-defined transforms running in true streaming execution
  * (MemoryStream source, memory sink, watermarked state).
  *
  * Tagged Slow (r15): real micro-batch execution with watermark waits —
  * ~64 s of pure wall-clock, the suite's single largest block. The
  * default `sbt test` gate excludes Slow so it fits the driver's budget
  * (VERDICT r14 item 2); run this lane with `sbt testSlow`. */
@org.scalatest.tags.Slow
class StreamingSpec extends AnyFunSuite {
  private lazy implicit val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L

  test("windowedEventAgg over a stream: windows close when the watermark passes") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double)]
    val events = source.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedEventAgg(events, "10 minutes", "5 minutes")

    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData((ns(10), "click", 1.0), (ns(20), "click", 2.0), (ns(30), "view", 5.0))
      q.processAllAvailable()
      // advance event time far past watermark so the first window closes
      source.addData((ns(7200), "click", 9.0))
      q.processAllAvailable()
      val closed = spark.table("win_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(closed == Set((0L, "click", 2L, 3.0), (0L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sliding windowedEventAgg: each event lands in len/slide windows, stream ≡ batch") {
    implicit val ctx = spark.sqlContext
    // 10-minute windows sliding by 5: an event at t=310s belongs to the
    // windows starting at -300 (clipped to ...) and 0 and 300? No: starts
    // 0 and 300 — exactly len/slide = 2 windows
    val rows = Seq((ns(310), "click", 1.0), (ns(620), "click", 2.0))
    val batch = rows.toDF("ts", "event_type", "value")
    val expect = Streaming.windowedEventAgg(batch, "10 minutes", "5 minutes",
        slide = Some("5 minutes"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // event 310 → windows 0, 300; event 620 → windows 300, 600
    assert(expect == Set(
      (0L, "click", 1L, 1.0), (300L, "click", 2L, 3.0), (600L, "click", 1L, 2.0)))

    val source = MemoryStream[(Long, String, Double)]
    val agg = Streaming.windowedEventAgg(source.toDF().toDF("ts", "event_type", "value"),
      "10 minutes", "5 minutes", slide = Some("5 minutes"))
    val q = agg.writeStream.format("memory").queryName("slide_test")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      source.addData((ns(7200), "click", 9.0)) // push watermark far past
      q.processAllAvailable()
      val closed = spark.table("slide_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(closed == expect)
    } finally q.stop()
  }

  test("streaming from a real file source: windowedEventAgg over incrementally arriving parquet") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val schema = "ts LONG, event_type STRING, value DOUBLE"
    // first micro-batch of files on disk before the stream starts
    Seq((ns(10), "click", 1.0), (ns(20), "click", 2.0))
      .toDF("ts", "event_type", "value").write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = Streaming.windowedEventAgg(stream, "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("file_src_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // a second file arrives; its event time closes the first window
      Seq((ns(7200), "view", 9.0)).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val closed = spark.table("file_src_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(closed == Set((0L, "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("foreachBatch CDC merge: a change stream maintains a snapshot through CdcMerge") {
    implicit val ctx = spark.sqlContext
    import graft.operators.CdcMerge
    var snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    val source = MemoryStream[(Long, String, Double, String)]
    val q = source.toDF().toDF("id", "name", "v", "op").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the standard streaming-merge pattern: each micro-batch is a
        // compacted changeset applied transactionally to the snapshot
        snapshot = CdcMerge(snapshot, batch, Seq("id")).localCheckpoint()
      }.start()
    try {
      source.addData((2L, "b2", 25.0, CdcMerge.Upsert), (3L, "c", 30.0, CdcMerge.Upsert))
      q.processAllAvailable()
      source.addData((1L, "a", 10.0, CdcMerge.Delete))
      q.processAllAvailable()
      val rows = snapshot.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((2L, "b2", 25.0), (3L, "c", 30.0)))
    } finally q.stop()
  }

  test("foreachBatch incremental dedup: a doc stream dedups against the accumulated registry") {
    implicit val ctx = spark.sqlContext
    import graft.dedup.Dedup
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "completely different text about accordions and submarines in equal measure"))
      .toDF("doc_id", "text")
    // buildBandRegistry clears catalog AND location, so re-runs are safe
    Dedup.buildBandRegistry(base, "doc_id", "text", "graft_stream_reg", buckets = 4)
    val flagged = scala.collection.mutable.Map[Long, Long]()
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("doc_id", "text").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the production ingestion loop: each micro-batch signatures only
        // itself, claims against (and appends to) the persistent registry
        Dedup.dedupAgainstRegistry(batch, "doc_id", "text",
            "graft_stream_reg", buckets = 4)
          .collect().foreach(r => flagged(r.getLong(0)) = r.getLong(2))
      }.start()
    try {
      source.addData(
        (2L, "the quick brown fox jumps over the lazy dog near the river bank"))
      q.processAllAvailable()
      source.addData(
        (3L, "fresh novel content mentioning telescopes and granite all day long"))
      q.processAllAvailable()
      source.addData(
        (4L, "fresh novel content mentioning telescopes and granite all day long"))
      q.processAllAvailable()
    } finally q.stop()
    assert(flagged(2L) > 0L, "verbatim copy of the pre-stream corpus not flagged")
    assert(flagged(3L) == 0L, "fresh content wrongly flagged")
    // the decisive case: duplicate of an EARLIER MICRO-BATCH, caught only
    // because the registry accumulated across batches
    assert(flagged(4L) > 0L, "cross-micro-batch duplicate not flagged")
  }

  test("latestByKey: out-of-order and re-delivered changes converge to the batch answer") {
    implicit val ctx = spark.sqlContext
    val changes = Seq( // (user, version, event_id, payload) — out of order
      (1L, 50L, 3L, "c"), (1L, 10L, 1L, "a"), (1L, 50L, 2L, "b"), // version tie → event_id 3 wins
      (2L, 20L, 4L, "d"))
    val batch = Streaming.latestByKey(
      changes.toDF("user_id", "ts_s", "event_id", "event_type"),
      Seq("user_id"), Seq("ts_s", "event_id"), Seq("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(batch == Set((1L, 50L, 3L, "c"), (2L, 20L, 4L, "d")))

    val source = MemoryStream[(Long, Long, Long, String)]
    val latest = Streaming.latestByKey(
      source.toDF().toDF("user_id", "ts_s", "event_id", "event_type"),
      Seq("user_id"), Seq("ts_s", "event_id"), Seq("event_type"))
    val q = latest.writeStream.format("memory").queryName("latest_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      source.addData(changes(0), changes(1))
      q.processAllAvailable()
      source.addData(changes(2), changes(3))
      source.addData(changes(0)) // at-least-once re-delivery
      q.processAllAvailable()
      val streamed = spark.table("latest_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowedEventAgg: same definition gives same answer in batch mode") {
    val batch = Seq((ns(10), "click", 1.0), (ns(20), "click", 2.0), (ns(700), "click", 7.0))
      .toDF("ts", "event_type", "value")
    val out = Streaming.windowedEventAgg(batch, "10 minutes", "5 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((0L, 2L, 3.0), (600L, 1L, 7.0)))
  }

  test("curation surface is stream-transparent: heuristicFilters + redactPii batch ≡ stream") {
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      (1L, ((1 to 50).map(i => s"word$i") :+ "the").mkString(" ")),
      (2L, "the a of"),
      (3L, "mail bob@example.org or 555-0199 plus " +
        ((1 to 40).map(i => s"tok$i") :+ "the").mkString(" ")))
    val source = MemoryStream[(Long, String)]
    val streamed = graft.pipeline.TrainingPrep.mixtureSample(
      graft.text.Curation.hashedLinearScore(
        graft.text.Curation.redactPii(
          graft.text.Curation.heuristicFilters(
            source.toDF().toDF("doc_id", "text"), "text"), "text"), "text"),
      "doc_id", org.apache.spark.sql.functions.lit(0.5))
    val q = streamed.writeStream.format("memory").queryName("cur_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(docs: _*)
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "keep", "n_emails", "n_phones", "redacted", "logit", "model_keep",
          "sampled")
        .collect().map(r =>
          (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getString(4),
            r.getDouble(5), r.getBoolean(6), r.getBoolean(7))).toSet
      val batch = graft.pipeline.TrainingPrep.mixtureSample(
        graft.text.Curation.hashedLinearScore(
          graft.text.Curation.redactPii(
            graft.text.Curation.heuristicFilters(docs.toDF("doc_id", "text"), "text"),
            "text"), "text"),
        "doc_id", org.apache.spark.sql.functions.lit(0.5))
      assert(shape(spark.table("cur_stream")) == shape(batch))
      assert(shape(batch).exists(t => t._5.contains("<EMAIL>") && t._5.contains("<PHONE>")))
    } finally q.stop()
  }

  test("blocklist + NFC + FIM surface is stream-transparent: batch ≡ stream") {
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      (0L, "clean words here"),
      (1L, "a bad phrase crosses here"),
      (2L, "cafe\u0301 mixed codepoints"),
      (3L, ""))
    def pipelineOf(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TrainingPrep.fimTransform(
        graft.text.TextAnalysis.normalizeUnicode(
          graft.text.Curation.blocklistTag(df, "text", Seq("bad phrase", "zzz")),
          "text"),
        "doc_id", "nfc_text")
    val source = MemoryStream[(Long, String)]
    val q = pipelineOf(source.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bl_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(docs: _*)
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "blocklist_hits", "blocklist_terms", "was_normalized",
          "fim_applied", "fim_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getBoolean(3), r.getBoolean(4), r.getString(5))).toSet
      val batch = shape(pipelineOf(docs.toDF("doc_id", "text")))
      assert(shape(spark.table("bl_stream")) == batch)
      assert(batch.exists(_._3 == "bad phrase"))     // blocklist hit flows through
      assert(batch.exists(t => t._1 == 2L && t._4))  // NFC fired on the stream
    } finally q.stop()
  }

  test("mixtureRepeat and trained-weight scoring are stream-transparent: batch ≡ stream") {
    implicit val ctx = spark.sqlContext
    // train on a static labeled relation (the model is a plan-time
    // literal), serve over a stream: upsampled copies + scores must
    // match the batch run row for row
    val labeled = Seq((1L, "good clean text here", 1.0), (2L, "zz qq xx", 0.0),
      (3L, "more good clean text", 1.0), (4L, "vv kk jj", 0.0))
      .toDF("doc_id", "text", "y")
    val (w, b) = graft.text.Curation.trainHashedLogistic(labeled, "text", "y", epochs = 15)
    val docs = Seq((10L, "good clean text here"), (11L, "zz qq xx"), (12L, "fresh doc"))
    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TrainingPrep.mixtureRepeat(
        graft.text.Curation.hashedLinearScore(df, "text", bias = b, weights = Some(w)),
        "doc_id", org.apache.spark.sql.functions.lit(2.5))
    val source = MemoryStream[(Long, String)]
    val q = pipe(source.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(docs: _*)
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "copy", "logit", "model_keep")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
      val streamRows = shape(spark.table("mix_stream"))
      assert(streamRows == shape(pipe(docs.toDF("doc_id", "text"))))
      // upsampling actually happened in the stream: weight 2.5 gives every
      // document at least copies 0 and 1
      val copiesPerDoc = streamRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(copiesPerDoc.values.forall(cs => cs.contains(0L) && cs.contains(1L)))
    } finally q.stop()
  }

  test("minhashBandRegistry: stream equals batch when arrival follows id order") {
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      (1L, ns(10), "alpha beta gamma delta epsilon zeta"),
      (2L, ns(20), "alpha beta gamma delta epsilon zeta"),   // exact dup of 1
      (3L, ns(30), "one two three four five six seven"),
      (4L, ns(40), "beta gamma delta epsilon zeta eta"),     // near dup of 1
      (5L, ns(50), "totally different words appear here now"))
    val source = MemoryStream[(Long, Long, String)]
    val stream = source.toDF().toDF("doc_id", "ts", "text")
      .withColumn("event_time", Streaming.nanosToTimestamp("ts"))
      .withWatermark("event_time", "10 minutes")
    val reg = Streaming.minhashBandRegistry(stream, "doc_id", "text",
      shingleN = 3, k = 12, bands = 4, rows = 3)
    val q = reg.writeStream.format("memory").queryName("band_reg")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(docs.take(2).map(d => (d._1, d._2, d._3)): _*)
      q.processAllAvailable()
      source.addData(docs.drop(2).map(d => (d._1, d._2, d._3)): _*)
      q.processAllAvailable()
      val streamed = spark.table("band_reg").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val batch = Streaming.minhashBandRegistry(
        docs.toDF("doc_id", "ts", "text"), "doc_id", "text",
        shingleN = 3, k = 12, bands = 4, rows = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(streamed == batch)
      // the exact duplicate claimed no band key; every other doc claimed some
      val keepers = streamed.map(_._2)
      assert(!keepers.contains(2L))
      assert(Set(1L, 3L, 5L).subsetOf(keepers))
    } finally q.stop()
  }

  test("streaming ANN ingest: embeddings stream into the bucketed at-rest layout, probes prune") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ann").toString
    val source = MemoryStream[(Long, Array[Float])]
    val bucketed = graft.similarity.Similarity.withHyperplaneBuckets(
      source.toDF().toDF("vec_id", "embedding"), "embedding", planes = 2, dims = 4)
    val q = bucketed.writeStream.format("parquet")
      .partitionBy("bucket")
      .option("path", s"$dir/index")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
      source.addData((3L, Array(1f, 0.1f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    val index = spark.read.parquet(s"$dir/index")
    assert(index.count() == 3)
    // a probe reads only its own bucket's partitions — the same pruning
    // the batch at-rest layout test pins, now over a streamed index
    // partition-column inference types `bucket` as int on read-back
    val probeBucket = index.where(col("vec_id") === 1L)
      .select("bucket").head.getAs[Number](0).longValue
    val probed = index.where(col("bucket") === probeBucket)
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // identical vectors land in the same bucket whether batched or streamed
    assert(probed.collect().map(_.getLong(0)).toSet.contains(3L))
  }

  test("streamingDedup drops in-stream duplicates within the watermark") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Double)]
    val events = source.toDF().toDF("ts", "event_id", "event_type", "value")
    val dedup = Streaming.streamingDedup(events, "10 minutes", Seq("event_id"))

    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData((ns(10), 1L, "click", 1.0), (ns(10), 1L, "click", 1.0), (ns(20), 2L, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2)
    } finally q.stop()
  }

  test("streamingDedup == firstByKey when delivery respects event-time order (st8's claim)") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Double)]
    val events = source.toDF().toDF("ts", "event_id", "event_type", "value")
    val dedup = Streaming.streamingDedup(events, "10 minutes", Seq("event_id"))
      .select("event_id", "ts", "event_type", "value")
    val q = dedup.writeStream.format("memory").queryName("dedup_eq_test")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      (ns(10), 1L, "click", 1.0), (ns(20), 2L, "view", 2.0), // originals
      (ns(40), 1L, "click", 1.0), (ns(50), 3L, "buy", 3.0))  // re-delivery of 1 + fresh 3
    try {
      // originals arrive in an earlier batch than the re-delivery, so the
      // stream's first-ARRIVAL choice coincides with first-by-event-time
      source.addData(rows.take(2): _*)
      q.processAllAvailable()
      source.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("dedup_eq_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
      val batch = Streaming.firstByKey(rows.toDF("ts", "event_id", "event_type", "value"),
        keyCols = Seq("event_id"), orderCols = Seq("ts"),
        payloadCols = Seq("event_type", "value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
      assert(got == batch && got.map(_._1) == Set(1L, 2L, 3L), s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("eventIntervalJoin: stream-stream join matches the batch definition") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long, Double)]
    val buys = MemoryStream[(Long, Long, Long, Double)]
    val cols = Seq("event_id", "ts", "user_id", "value")
    val joined = Streaming.eventIntervalJoin(
      clicks.toDF().toDF(cols: _*), buys.toDF().toDF(cols: _*),
      watermark = "1 minute", windowSeconds = 60L)

    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 7: click@10 pairs with buys @30 and @60; buy@100 is outside
      // the 60 s window; user 8's buy never pairs (no click)
      clicks.addData((1L, ns(10), 7L, 1.0))
      buys.addData((2L, ns(30), 7L, 5.0), (3L, ns(60), 7L, 6.0),
        (4L, ns(100), 7L, 7.0), (5L, ns(30), 8L, 8.0))
      q.processAllAvailable()
      val got = spark.table("ssj_test").collect()
        .map(r => (r.getLong(0), r.getLong(4))).toSet
      assert(got == Set((1L, 2L), (1L, 3L)))

      // batch execution of the SAME definition agrees
      val batchClicks = Seq((1L, ns(10), 7L, 1.0)).toDF(cols: _*)
      val batchBuys = Seq((2L, ns(30), 7L, 5.0), (3L, ns(60), 7L, 6.0),
        (4L, ns(100), 7L, 7.0), (5L, ns(30), 8L, 8.0)).toDF(cols: _*)
      val batch = Streaming.eventIntervalJoin(batchClicks, batchBuys, "1 minute", 60L)
        .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("topK aggregator runs under streaming aggregation (mergeable state across batches)") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double, Long)]
    val events = source.toDF().toDF("ts", "k", "score", "id")
    val top = graft.folds.Aggregators.asColumn(
      graft.folds.Aggregators.topK(2), col("score"), col("id"))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    val agg = events
      .withColumn("event_time", Streaming.nanosToTimestamp("ts"))
      .withWatermark("event_time", "10 minutes")
      .groupBy(col("k"))
      .agg(top.as("top"))

    val q = agg.writeStream.format("memory").queryName("topk_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // two separate batches: the buffer from batch 1 must MERGE with
      // batch 2's partial state, not be recomputed from scratch
      source.addData((ns(10), "a", 1.0, 1L), (ns(11), "a", 5.0, 2L))
      q.processAllAvailable()
      source.addData((ns(12), "a", 3.0, 3L), (ns(13), "a", 0.5, 4L))
      q.processAllAvailable()
      val rows = spark.table("topk_stream").collect()
      assert(rows.length == 1)
      val top2 = rows.head.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getDouble(0), e.getLong(1)))
      assert(top2 == Seq((5.0, 2L), (3.0, 3L)))
    } finally q.stop()
  }

  test("sessionizeEventTime in batch: gap-splits into x14-equivalent sessions") {
    val events = Seq(
      (ns(100), 1L, 1.0), (ns(160), 1L, 2.0),   // session 0 of user 1
      (ns(1000), 1L, 4.0),                      // gap > 300 → session 1
      (ns(100), 2L, 5.0))                       // session 0 of user 2
      .toDF("ts", "user_id", "value")
    val out = Streaming.sessionizeEventTime(events, gapSeconds = 300, watermark = "5 minutes")
      .collect().map(s => (s.user_id, s.session_seq) -> s).toMap
    assert(out.size == 3)
    assert(out((1L, 0L)).n_events == 2 && out((1L, 0L)).sum_value == 3.0
      && out((1L, 0L)).start_s == 100L && out((1L, 0L)).end_s == 160L)
    assert(out((1L, 1L)).n_events == 1 && out((1L, 1L)).sum_value == 4.0)
    assert(out((2L, 0L)).n_events == 1 && out((2L, 0L)).sum_value == 5.0)
  }

  test("sessionizeEventTime over a stream: sessions close by gap-split and by event-time timeout") {
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double)]
    val events = source.toDF().toDF("ts", "user_id", "value")
    val sessions = Streaming.sessionizeEventTime(events, gapSeconds = 300, watermark = "10 seconds")

    val q = sessions.toDF().writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData((ns(100), 1L, 1.0), (ns(160), 1L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_test").count() == 0) // session still open

      // a later event of the SAME user past the gap closes session 0 inline
      source.addData((ns(1000), 1L, 4.0))
      q.processAllAvailable()
      val afterSplit = spark.table("sess_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(afterSplit == Set((1L, 0L, 2L, 3.0)))

      // another user's far-future events push the watermark past
      // end_s + gap → user 1's open session times out and is emitted
      source.addData((ns(100000), 2L, 7.0))
      q.processAllAvailable()
      source.addData((ns(100001), 2L, 8.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(afterTimeout.contains((1L, 1L, 1L, 4.0)))

      // stream-closed sessions match the batch run of the SAME definition
      // (batch additionally emits each user's final, still-open session)
      val batch = Streaming.sessionizeEventTime(
        Seq((ns(100), 1L, 1.0), (ns(160), 1L, 2.0), (ns(1000), 1L, 4.0),
          (ns(100000), 2L, 7.0), (ns(100001), 2L, 8.0)).toDF("ts", "user_id", "value"),
        gapSeconds = 300, watermark = "10 seconds")
        .collect().map(s => (s.user_id, s.session_seq, s.n_events, s.sum_value)).toSet
      assert(batch == afterTimeout + ((2L, 0L, 2L, 15.0)))
    } finally q.stop()
  }

  test("decontamination is stream-transparent: stream-static broadcast join ≡ batch") {
    implicit val ctx = spark.sqlContext
    // benchmark is STATIC (the realistic shape: eval sets don't stream);
    // the corpus streams through the same one definition as t12
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon eta theta"),   // one shared 5-gram
      (2L, "alpha beta gamma delta epsilon zeta iota"),   // two shared 5-grams
      (3L, "nothing in common with the benchmark at all none"))
    val source = MemoryStream[(Long, String)]
    val streamed = graft.text.Curation.decontaminate(
      source.toDF().toDF("doc_id", "text"), bench, "doc_id", "text", n = 5)
    val q = streamed.writeStream.format("memory").queryName("decon_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      source.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table("decon_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.text.Curation.decontaminate(
        docs.toDF("doc_id", "text"), bench, "doc_id", "text", n = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stream == batch)
      assert(batch == Set((1L, 1L), (2L, 2L)))
    } finally q.stop()
  }

  test("html extraction + url features + media sniff are stream-transparent: batch ≡ stream") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // the round's stateless operators: pure projections + a broadcast
    // join, so the SAME definition must run unchanged over a stream
    val rows = Seq(
      (1L, "<html><body><h1>T</h1><p>alpha &amp; beta</p></body></html>",
        "https://www.ok.example.com/a/b"),
      (2L, "<p>plain</p>", "http://bad.example.org/x"))
    val blocklist = Seq("example.org").toDF("domain")
    val source = MemoryStream[(Long, String, String)]
    val streamed = graft.text.Curation.urlFeatures(
      source.toDF().toDF("doc_id", "html", "url")
        .withColumn("clean_text", graft.text.Curation.extractHtmlText(col("html"))),
      "url", blocklist)
    val q = streamed.writeStream.format("memory").queryName("t2223_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "clean_text", "url_domain", "is_blocked")
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3))).toSet
      val batch = graft.text.Curation.urlFeatures(
        rows.toDF("doc_id", "html", "url")
          .withColumn("clean_text", graft.text.Curation.extractHtmlText(col("html"))),
        "url", blocklist)
      assert(shape(spark.table("t2223_stream")) == shape(batch))
      assert(shape(batch) == Set(
        (1L, "T alpha & beta", "example.com", false),
        (2L, "plain", "example.org", true)))
    } finally q.stop()

    // media sniff over a binary stream: same expression, same rows
    val media = Seq(
      (1L, graft.multimodal.Multimodal.solidPng(9, 3, 2)),
      (2L, "junk".getBytes("UTF-8")))
    val msrc = MemoryStream[(Long, Array[Byte])]
    val sniffed = graft.multimodal.Multimodal.sniffMedia(
      msrc.toDF().toDF("media_id", "content"))
    val mq = sniffed.writeStream.format("memory").queryName("m10_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      msrc.addData(media: _*)
      mq.processAllAvailable()
      val got = spark.table("m10_stream")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "png"), (2L, null)))
    } finally mq.stop()
  }

  test("audio resample + patchify are stream-transparent: batch ≡ stream") {
    implicit val ctx = spark.sqlContext
    // both are stateless typed mapPartitions — the SAME definition must
    // run unchanged over a MemoryStream with identical rows out
    val M = graft.multimodal.Multimodal
    val ramp = (0 until 50).map(i => (-100 + 7 * i).toShort).toArray
    val rows = Seq(
      (1L, graft.multimodal.WavCodec.encodePcm16(8000, 1, ramp), "audio/wav"),
      (2L, "junk".getBytes("UTF-8"), "audio/wav"), // undecodable: no rows
      (3L, M.solidPng(120, 9, 7), "image/png"),    // 2x1 grid of 4x4 patches
      (4L, Array[Byte](1, 2, 3), "image/png"))     // undecodable: no rows
    val src = MemoryStream[(Long, Array[Byte], String)]
    val media = src.toDF().toDF("media_id", "content", "mime")

    val rq = M.audioResample(media, 16000).writeStream.format("memory")
      .queryName("m12_stream").outputMode(OutputMode.Append()).start()
    val pq = M.patchify(media, 4).writeStream.format("memory")
      .queryName("m13_stream").outputMode(OutputMode.Append()).start()
    try {
      src.addData(rows: _*)
      rq.processAllAvailable()
      pq.processAllAvailable()
      val batchMedia = rows.toDF("media_id", "content", "mime")
      def rShape(df: org.apache.spark.sql.DataFrame) = df
        .select("media_id", "src_rate", "dst_rate", "n_src", "n_out", "sum_out")
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))
        .toSet
      assert(rShape(spark.table("m12_stream")) ==
        rShape(M.audioResample(batchMedia, 16000).toDF()))
      assert(rShape(spark.table("m12_stream")).map(t => (t._1, t._4, t._5)) ==
        Set((1L, 50, 99))) // (n-1)*16000/8000 + 1
      def pShape(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toSet
      assert(pShape(spark.table("m13_stream")) ==
        pShape(M.patchify(batchMedia, 4).toDF()))
      // solid gray 120: every patch mean is exactly 120/255
      assert(pShape(spark.table("m13_stream")) ==
        Set((3L, 0, 0, 4, 120.0 / 255.0), (3L, 1, 0, 4, 120.0 / 255.0)))
    } finally { rq.stop(); pq.stop() }
  }

  test("windowedHeavyHitters: Space-Saving state per window, stream ≡ batch, exact in-capacity") {
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (ns(10), "click", 1.0), (ns(20), "click", 1.0), (ns(30), "view", 1.0),
      (ns(40), "view", 1.0), (ns(50), "buy", 1.0), (ns(55), "click", 1.0))
    val source = MemoryStream[(Long, String, Double)]
    val q = Streaming.windowedHeavyHitters(
        source.toDF().toDF("ts", "event_type", "value"), "10 minutes", "5 minutes",
        capacity = 8, topN = 2)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      source.addData((ns(7200), "click", 1.0)) // close the first window
      q.processAllAvailable()
      val got = spark.table("hh_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      // exact regime: top-2 of {click:3, view:2, buy:1}
      assert(got == Set((0L, 1, "click", 3L), (0L, 2, "view", 2L)))
      val batch = Streaming.windowedHeavyHitters(
          rows.toDF("ts", "event_type", "value"), "10 minutes", "5 minutes",
          capacity = 8, topN = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("URL canonicalization + readability + chat render are stream-transparent: batch ≡ stream") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "HTTP://WWW.A.com:80/x//y/?b=2&utm_source=u&a=1#f", "The cat sat. Quietly!"),
      (2L, "not a url", "a b c"),
      (3L, "https://B.org/p", "zzz."))
    def pipelineOf(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TrainingPrep.renderChatTemplate(
        graft.text.TextAnalysis.readability(df, "text")
          .withColumn("url_canonical", graft.text.Curation.canonicalizeUrl(col("url")))
          .withColumn("turns", array(
            struct(lit("user").as("role"), col("url").as("content")),
            struct(lit("assistant").as("role"), col("text").as("content")))),
        "turns")
        .select(col("doc_id"), col("url_canonical"), col("n_words"), col("fre"),
          col("chat_text"),
          element_at(col("mask_spans"), 1).getField("s").as("span_s"))
    val source = MemoryStream[(Long, String, String)]
    val q = pipelineOf(source.toDF().toDF("doc_id", "url", "text"))
      .writeStream.format("memory").queryName("url_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getDouble(3),
          r.getString(4), r.getLong(5))).toSet
      val batch = shape(pipelineOf(rows.toDF("doc_id", "url", "text")))
      assert(shape(spark.table("url_stream")) == batch)
      assert(batch.exists(t => t._1 == 1L && t._2.contains("http://a.com/x/y?a=1&b=2")))
      assert(batch.exists(t => t._1 == 2L && t._2.isEmpty)) // invalid URL -> null, stream-safe
    } finally q.stop()
  }
}
