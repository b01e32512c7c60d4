package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are SQL-expressible) the equivalent DuckDB oracle SQL. Column
  * names MUST match between the two — the driver's compare sorts columns by
  * name before hashing.
  *
  * ORACLE TYPE CHECKLIST (the driver compares both sides through pandas —
  * every row below hash-mismatches AT EQUAL VALUES if violated; the p1/d4
  * bug class). `tools/check.py --exact` enforces all of these:
  *   - DuckDB `sum(<integer expr>)` → HUGEINT → pandas float64. Cast every
  *     integer sum that SURFACES in the output: `sum(x)::BIGINT`. Window
  *     sums (`sum(x) OVER ...`) and `list_sum` over integers promote too.
  *     Sums over DOUBLE columns are safe.
  *   - `count(*)` is BIGINT (safe), but ARITHMETIC on counts
  *     (`count(*) * 2`, `c1 + c2`) can re-promote — cast the result.
  *   - No array/struct column may surface in a checked output — the
  *     driver's pandas canonicalizer cannot sort/hash array cells (the p6
  *     crash class). Stringify: `array_to_string(..., ' ')` / Spark
  *     `array_join`.
  *   - Floats are compared bit-for-bit; where engines legitimately differ
  *     in the last ulp, round BOTH sides identically (`round(x, 9)`).
  *   - DuckDB `extract(...)` is BIGINT; Spark date functions are INT —
  *     cast the Spark side to long (x31 precedent). */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) (read back as BIGINT via
    // the legacy flag) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) across
    // driver testdata generations; Streaming.epochSeconds adapts per schema.
    // Pin UTC so naive timestamps match DuckDB's epoch_ns interpretation.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Scratch path for an in-plan at-rest artifact (index, tokenizer
    * model, round-trip file): unique per (query tag, JVM, testdata dir)
    * so concurrent Verify/Bench processes and different SFs never
    * collide, stable within a process so a query's build-then-read is
    * coherent. One definition — seven queries share the idiom. */
  def tmpArtifactPath(tag: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${tag}_" +
      s"${ProcessHandle.current().pid()}_${Integer.toHexString(dir.hashCode)}"
}
