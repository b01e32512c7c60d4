package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: re-time a few probes (see ScaleProbe). */
object ReProbe {
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
      CacheRegistry.unpersistAll()
      spark.catalog.clearCache()
      graft.queries.ExtensionQueries.clearArtifactCaches()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Default probe set: the queries whose driver-tail numbers have
    // historically spiked under sweep/GC drag (r3 verdict) — re-timing
    // them on an idle JVM pre-explains phantom regressions in NOTES.md.
    val probes =
      if (args.nonEmpty) args.toSeq
      else Seq("s6_ann_recall", "st1_windowed_events", "st2_sessionize",
        "st3_stream_interval_join", "st4_minhash_band_registry",
        "x20_skew_join", "t21_model_filter_trained", "d2_dedup_ngram_jaccard",
        "x34_pagerank") // spiked 12x once in a driver-protocol bench (r5)
    for (n <- probes) {
      time(src, n) // JIT warm
      val t1 = time(src, n)
      val t10 = time(big, n)
      println(f"REPROBE $n%-26s $t1%8.2f $t10%8.2f ${t10 / t1}%6.1f")
    }
    spark.stop()
  }
}
