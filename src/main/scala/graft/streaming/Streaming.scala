package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.10: the reference's fold model —
  * incremental step + associative merge — is exactly Spark's streaming
  * partial-aggregation contract, so the batch agg layer runs on streams
  * unchanged).
  *
  * Every transform here takes a DataFrame and works in BOTH batch and
  * streaming execution: the driver's correctness gate runs them as batch
  * queries over the `events` parquet; the test suite runs the same code
  * over a `MemoryStream` with watermarks. That one-definition/two-runtimes
  * property is the design goal — it is how a 100 TB backfill and the live
  * stream share one query definition.
  */
object Streaming {

  /** events.ts arrives as BIGINT nanoseconds (TESTDATA parquet is
    * nanos; read with nanosAsLong). → TimestampType seconds. */
  def nanosToTimestamp(tsNanos: String): org.apache.spark.sql.Column =
    timestamp_seconds(expr(s"$tsNanos div 1000000000"))

  /** Tumbling event-time window aggregation with a watermark: count + sum
    * per (window, event_type). Emits `window_start_s` as epoch seconds (a
    * timezone-free representation for cross-engine comparison). */
  def windowedEventAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withColumn("event_time", nanosToTimestamp("ts"))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming dedup: first occurrence per key within the watermark bound —
    * the streaming face of exact dedup. `dropDuplicatesWithinWatermark`
    * keys the state store by `keyCols` alone (a re-delivered event with a
    * slightly different timestamp — the normal at-least-once duplicate —
    * is still dropped) and expires state by the watermark. */
  def streamingDedup(events: DataFrame, watermark: String, keyCols: Seq[String]): DataFrame =
    events
      .withColumn("event_time", nanosToTimestamp("ts"))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class SessionInput(user_id: Long, ts_s: Long, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long, sum_value: Double, span_s: Long)
  private final case class SessionState(n: Long, sum: Double, minTs: Long, maxTs: Long)

  /** Custom sessionization state machine via `mapGroupsWithState` — the
    * `KeyValueGroupedDataset` custom-state escape hatch (the streaming
    * analog of the reference's arbitrary per-group folds). Sessions close
    * after `gapSeconds` of inactivity (processing-time timeout). */
  def sessionize(events: Dataset[SessionInput], gapSeconds: Long): Dataset[SessionSummary] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionSummary]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionSummary(userId, s.n, s.sum, s.maxTs - s.minTs)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
            val next = rows.foldLeft(prev)((s, e) =>
              SessionState(s.n + 1, s.sum + e.value, math.min(s.minTs, e.ts_s), math.max(s.maxTs, e.ts_s)))
            state.update(next)
            state.setTimeoutDuration(gapSeconds * 1000)
            SessionSummary(userId, next.n, next.sum, next.maxTs - next.minTs)
          }
        })
  }

  /** Watermarked stream-stream interval join: pair each left event with
    * the right events of the same user landing within `windowSeconds` at
    * or after it. The time-range join condition plus BOTH watermarks is
    * what makes the state store bounded in streaming execution: a buffered
    * right event can be evicted once the left watermark passes
    * `r_time`, a left event once the right watermark passes
    * `l_time + windowSeconds`. In batch the same definition is a plain
    * equi+range join (watermarks are no-ops) — one definition, two
    * runtimes, like the rest of this module. */
  def eventIntervalJoin(
      left: DataFrame, right: DataFrame,
      watermark: String, windowSeconds: Long): DataFrame = {
    val l = left
      .withColumn("l_time", nanosToTimestamp("ts"))
      .withWatermark("l_time", watermark)
      .select(col("event_id").as("l_event_id"), col("user_id").as("l_user"),
        col("l_time"), col("value").as("l_value"))
    val r = right
      .withColumn("r_time", nanosToTimestamp("ts"))
      .withWatermark("r_time", watermark)
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"),
        col("r_time"), col("value").as("r_value"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_time") >= col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $windowSeconds SECONDS"))
  }

  /** Convenience: run a streaming DataFrame to a named in-memory sink and
    * block until the available data is processed (test/dev harness). */
  def runToMemorySink(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }
}
