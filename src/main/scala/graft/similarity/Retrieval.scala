package graft.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical (sparse) retrieval over the documents table — BM25 scoring and
  * an inverted index at rest. Driver extension surface (the reference has
  * no retrieval ops, SURVEY §2.12): real curation pipelines use lexical
  * retrieval next to the embedding ANN family — for decontamination
  * lookups, quality-by-retrievability scoring, and hard-negative mining
  * seeds (BM25 negatives are the standard DPR starting point).
  *
  * Scoring is Robertson/Spärck Jones BM25 (k1, b): for query q and doc d,
  *   score(q,d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)    = ln((N − df + 0.5) / (df + 0.5) + 1)    (Lucene's variant —
  *               non-negative for every df, unlike the classic form)
  *
  * Determinism contract (what makes the DuckDB oracle exact): tf, dl, N,
  * df are integers; avgdl is one exact integer sum divided once; idf is
  * rounded to 9 dp the moment it is computed (ln is the single
  * libm-vs-JVM divergent op — everything downstream is IEEE-exact given
  * equal operands); per-(query, doc) term contributions are summed by an
  * explicit LEFT FOLD IN TERM ORDER (`aggregate` over a sorted array —
  * a plain groupBy sum would add in shuffle order, which no external
  * engine can replicate bit-for-bit).
  *
  * Scale shape (r14): the corpus is tokenized ONCE; the query vocabulary
  * (broadcast-small by contract, same as the ANN query sets) filters
  * exploded tokens BEFORE the (doc, term) partial-agg shuffle, so only
  * query-term postings ever cross the wire — df is then a term-keyed agg
  * of that already-filtered relation, never of the full dictionary;
  * N/avgdl are a broadcast 1-row corpus aggregate; the final top-k uses
  * the bounded mergeable aggregator, so at most k rows per query per
  * partition cross the last shuffle.
  */
object Retrieval {

  /** Posting relation: one row per (doc, term) with term frequency and
    * document length (in tokens, single-space tokenizer — the corpus-wide
    * convention of [[graft.text.TextFunctions.tokens]]). One partial-agg
    * shuffle keyed on (doc_id, term). */
  def postings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("doc_id"),
        graft.text.TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** 1-row (n_docs, avgdl) relation: exact integer count and token sum,
    * one double division — bit-reproducible by any engine. */
  def corpusStats(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(size(graft.text.TextFunctions.tokens(col(textCol))).cast("long").as("__dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__dl")).as("__sdl"))
      .select(col("n_docs"),
        (col("__sdl").cast("double") / col("n_docs").cast("double")).as("avgdl"))

  /** All (query, doc) BM25 scores over the terms the query and doc share.
    * `queryTerms` must be a (query_id, term) relation, broadcast-small by
    * contract (it is hinted); duplicate (query_id, term) rows would
    * double-count — deduplicate upstream ([[queryTermsFromText]] does).
    *
    * Output: (query_id, neighbor_id, score) with `score` the FULL-precision
    * deterministic fold — callers round at the surface so ranking happens
    * on the exact value in every engine. */
  def bm25Scores(
      corpus: DataFrame, queryTerms: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75, maxDfFraction: Double = 1.0): DataFrame = {
    // round 14 (opt): the query vocabulary is broadcast-small by contract,
    // so push it BELOW the postings aggregation — only exploded tokens that
    // ARE query terms reach the (doc, term) partial-agg shuffle, and df for
    // those terms is a count over the filtered tf relation (identical
    // integers: df(t) = |{d : t ∈ d}| only ever needed for query terms).
    // Before: postings built TWICE (df branch + scoring branch — two full
    // tokenize+explode+shuffle passes) plus a THIRD full-dictionary
    // term-keyed shuffle for df over every term in the corpus. After: ONE
    // tokenize pass, one query-term-only shuffle, df from the persisted
    // filtered relation. 5 corpus scans → 2 (postings + stats);
    // s11 plan: 22 Exchanges → single-digit.
    // persisted: the query relation is read twice (vocabulary filter +
    // query-id attach) and deriving it can itself scan the corpus
    val qt = graft.CacheRegistry.persisted(
      queryTerms.select(col("query_id"), col("term")))
    val qvocab = broadcast(qt.select(col("term")).distinct())
    val qtf = graft.CacheRegistry.persisted(
      corpus
        .select(col(idCol).cast("long").as("doc_id"),
          graft.text.TextFunctions.tokens(col(textCol)).as("__toks"))
        .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
          explode(col("__toks")).as("term"))
        .join(qvocab, "term")
        .groupBy("doc_id", "dl", "term")
        .agg(count(lit(1)).as("tf")))
    val stats = corpusStats(corpus, textCol)
    // df per term from the filtered tf relation (one row per (doc, term),
    // so the count per term IS the document frequency); idf rounded HERE —
    // see the determinism contract above
    val df = pruneByDf(
      qtf.groupBy("term").agg(count(lit(1)).as("df")), stats, maxDfFraction)
    val idf = round(
      log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 9).as("idf")
    val scoredTerm = qtf
      .join(broadcast(df), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("term"),
        (idf * ((col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))))
          .as("contrib"))
    // left fold in term order: bit-identical across engines (see scaladoc)
    scoredTerm
      .groupBy("query_id", "neighbor_id")
      .agg(sort_array(collect_list(struct(col("term"), col("contrib")))).as("cs"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(col("cs"), lit(0.0), (acc, c) => acc + c.getField("contrib")).as("score"))
  }

  /** Derive a deduplicated (query_id, term) relation from query documents:
    * the first `nTerms` tokens, distinct. */
  def queryTermsFromText(
      queries: DataFrame, idCol: String, textCol: String, nTerms: Int): DataFrame =
    queries
      .select(col(idCol).cast("long").as("query_id"),
        explode(array_distinct(
          slice(graft.text.TextFunctions.tokens(col(textCol)), 1, nTerms))).as("term"))

  /** Per-query cost is Σ_{t ∈ q} df(t): an ultra-common query term walks
    * its ENTIRE posting list, which at corpus scale is the whole corpus
    * (real engines answer with WAND/MaxScore pruning; out of scope here).
    * `maxDfFraction < 1` is the classic pipeline mitigation — terms in
    * more than that fraction of documents are dropped from scoring
    * (an idf floor / stopword prune). Their idf is near zero anyway, so
    * rankings barely move while the worst-case posting walk disappears.
    * Exact semantics (the oracle's) at the default 1.0. */
  private def pruneByDf(df: DataFrame, stats: DataFrame, maxDfFraction: Double): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      "maxDfFraction must be in (0, 1]")
    if (maxDfFraction >= 1.0) df
    else df.crossJoin(broadcast(stats.select(col("n_docs"))))
      .where(col("df").cast("double") <=
        lit(maxDfFraction) * col("n_docs").cast("double"))
      .select(col("term"), col("df"))
  }

  /** Top-k BM25 retrieval: ranks on the full-precision deterministic score
    * (ties toward the smaller doc id), surfaces it rounded to 9 dp.
    * Queries drawn from the corpus match themselves — retrieval semantics,
    * unlike the ANN family's self-exclusion. See [[pruneByDf]] for
    * `maxDfFraction`. */
  def bm25TopK(
      corpus: DataFrame, queryTerms: DataFrame, idCol: String, textCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0): DataFrame =
    topKScored(bm25Scores(corpus, queryTerms, idCol, textCol, k1, b, maxDfFraction), k)

  /** Bounded per-query top-k over a (query_id, neighbor_id, score)
    * relation — the [[graft.folds.Aggregators.topK]] shape: at most k
    * entries per query per partition cross the shuffle. */
  private def topKScored(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.folds.Aggregators.asColumn(
      graft.folds.Aggregators.topK(k),
      col("score"), col("neighbor_id").cast("long"))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    scored
      .where(col("score").isNotNull && !isnan(col("score")))
      .groupBy(col("query_id"))
      .agg(top.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), col("e._2").as("neighbor_id"),
        round(col("e._1"), 9).as("score"), (col("i") + 1).cast("int").as("rank"))
  }

  // ------------------------------------------------------- index at rest

  /** Term bucket (both faces must agree): first 8 hex chars of md5(term),
    * parsed as a long, mod `buckets`. Driver-side twin of [[termBucketCol]]
    * — the probe computes its partition filter with this. */
  def termBucket(term: String, buckets: Int): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(term.getBytes(StandardCharsets.UTF_8))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  private def termBucketCol(term: org.apache.spark.sql.Column, buckets: Int) =
    (conv(substring(md5(term), 1, 8), 16, 10).cast("long") % buckets).as("term_bucket")

  /** Inverted index AT REST — the lexical twin of [[Similarity.writeIvfIndex]],
    * laid out the way Lucene lays out segments so that APPENDS stay exact:
    *
    *  - `dir/postings/term_bucket=N/` — the postings relation partitioned
    *    by a stable term bucket. Postings carry NO df: df is a GLOBAL
    *    per-term count that every appended segment would invalidate; at
    *    probe time it is recovered exactly from the pruned scan, because a
    *    term's postings live entirely inside its bucket.
    *  - `dir/meta` — one (n_docs, dl_sum) row PER SEGMENT (build + each
    *    append); probes sum them, so n_docs/avgdl are always
    *    whole-corpus-exact. Integer sums — no float accumulation drift.
    *
    * A probe reads ONLY the buckets its query terms hash to — partition
    * pruning in the scan; at 100 TB a q-term probe touches ~|q|/buckets of
    * the postings. Build cost: the postings shuffle + two tiny aggs,
    * nothing collected. */
  def writeInvertedIndex(
      corpus: DataFrame, idCol: String, textCol: String, dir: String,
      buckets: Int = 16): Unit = {
    require(buckets >= 1, "writeInvertedIndex: buckets must be >= 1")
    writeSegment(corpus, idCol, textCol, dir, buckets, overwrite = true)
  }

  /** Append new documents to an existing [[writeInvertedIndex]] layout —
    * the incremental-ingest face. Doc ids must be new (same contract as
    * [[Similarity.appendToIvfIndex]]); df/n_docs/avgdl need no rebuild:
    * df is recomputed from postings at probe time and the segment meta
    * rows sum exactly (see the layout scaladoc). Spec'd:
    * build(A) then append(B) ≡ build(A ∪ B) for every query. */
  def appendToInvertedIndex(
      newDocs: DataFrame, idCol: String, textCol: String, dir: String,
      buckets: Int = 16): Unit =
    writeSegment(newDocs, idCol, textCol, dir, buckets, overwrite = false)

  private def writeSegment(
      docs: DataFrame, idCol: String, textCol: String, dir: String,
      buckets: Int, overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    docs
      .select(size(graft.text.TextFunctions.tokens(col(textCol))).cast("long").as("__dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__dl")).as("dl_sum"))
      .coalesce(1).write.mode(mode).parquet(s"$dir/meta")
    postings(docs, idCol, textCol)
      .select(termBucketCol(col("term"), buckets), col("term"),
        col("doc_id"), col("dl"), col("tf"))
      .write.mode(mode).partitionBy("term_bucket").parquet(s"$dir/postings")
  }

  /** Query a [[writeInvertedIndex]] layout: the probed bucket set is
    * computed driver-side from the (broadcast-small by contract) query
    * term relation and pushed into the scan as a plan-time partition
    * filter (PlanSpec asserts it); df comes from one term-keyed agg of
    * the pruned scan, n_docs/avgdl from summing the segment meta rows.
    * Result ≡ [[bm25TopK]] with the same parameters — same postings,
    * same df, same fold order — which is what the shared oracle checks. */
  def bm25TopKIndexed(
      spark: SparkSession, dir: String, queryTerms: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75, buckets: Int = 16,
      maxDfFraction: Double = 1.0): DataFrame = {
    // persisted: executed twice (bucket collect, then the scoring join)
    val qt = graft.CacheRegistry.persisted(
      queryTerms.select(col("query_id"), col("term")))
    val probedBuckets = qt.select(col("term")).distinct()
      .collect().map(r => termBucket(r.getString(0), buckets)).distinct
    val meta = spark.read.parquet(s"$dir/meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("__sdl"))
      .select(col("n_docs"),
        (col("__sdl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    // persisted for the same reason as qt: the pruned scan feeds both the
    // df agg and the scoring join — one read, not two
    val posts = graft.CacheRegistry.persisted(spark.read.parquet(s"$dir/postings")
      .where(col("term_bucket").isin(probedBuckets.toIndexedSeq.map(Long.box): _*))
      .join(broadcast(qt.select(col("term")).distinct()), "term"))
    val df = pruneByDf(
      posts.groupBy("term").agg(count(lit(1)).as("df")), meta, maxDfFraction)
    val idf = round(
      log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 9).as("idf")
    val scoredTerm = posts
      .join(broadcast(df), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(meta))
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("term"),
        (idf * ((col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))))
          .as("contrib"))
    val scored = scoredTerm
      .groupBy("query_id", "neighbor_id")
      .agg(sort_array(collect_list(struct(col("term"), col("contrib")))).as("cs"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(col("cs"), lit(0.0), (acc, c) => acc + c.getField("contrib")).as("score"))
    topKScored(scored, k)
  }
}
