package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must ANALYZE against the real testdata schema.
  *
  * Guards the silent-drop failure class: when a driver testdata
  * regeneration changes a physical type (events.ts went parquet
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) between rounds 3 and 4), queries
  * referencing the old type fail analysis inside Verify's per-query
  * try/catch and simply vanish from the correctness report — 11 queries
  * disappeared for a full round without any test going red. Forcing
  * `queryExecution.analyzed` here makes schema drift a loud local failure.
  *
  * Executes a `count()` per query, not analysis alone: the x35 lesson —
  * Spark's corrupt-record-only-projection restriction (and anything else
  * raised during physical planning under column pruning) only fires when
  * an action runs, and Bench's `count()` prunes harder than Verify's
  * full-row write, so the cheapest complete replica of both gates is the
  * count itself at the smallest SF. */
class QueryRegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("all registered queries execute (count) against the sf0.001 testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r =
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
      CacheRegistry.unpersistAll()
      graft.queries.ExtensionQueries.clearArtifactCaches()
      r
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("every query has an oracle or is a documented rows-only exception") {
    // rows-only queries (no SQL analog) — keep this list in sync with
    // NOTES.md; growth here needs the same justification the existing
    // entries carry (iterative/approximate semantics with spec'd laws)
    // (round 13: a1/a2/a3 left this list — the sketch family now carries
    // TOLERANCE-BANDED oracles: exact anchors + in-bound booleans)
    val rowsOnly = Set(
      "p8_bpe_train", "p9_bpe_encode", "s4_ann_ivf_kmeans",
      "t21_model_filter_trained",
      "t29_compression_ratio", // deflate sizes are zlib-implementation-defined
      "p19_unigram_train", "p20_unigram_encode") // iterative EM, no SQL analog
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == rowsOnly,
      s"queries without oracle changed: ${(noOracle -- rowsOnly).toSeq.sorted} gained, " +
        s"${(rowsOnly -- noOracle).toSeq.sorted} stale")
  }
}
