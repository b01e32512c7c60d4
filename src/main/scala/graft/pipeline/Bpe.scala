package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016 — the subword algorithm behind GPT/Llama-family vocabularies),
  * distributed: the real version of the "BPE-ish regex" stand-in that
  * `TextAnalysis.tokenCounts` uses for counting.
  *
  * Training is inherently iterative — merge r+1 depends on the corpus
  * state after merge r — so the driver LOOPS, but each iteration is a
  * fixed two-job pipeline over the distributed word relation:
  *   1. pair counting: `flatMap` adjacent symbol pairs weighted by word
  *      frequency → one partial-aggregated shuffle (vocabulary-sized, not
  *      corpus-sized);
  *   2. argmax: `orderBy(count desc, pair asc).limit(1)` — distributed
  *      TakeOrdered, ships one row per partition; the winning pair (a
  *      few bytes) is the ONLY data that touches the driver;
  *   3. merge application: a narrow `map` over word symbol arrays.
  * The corpus itself is touched ONCE (the initial word-count aggregate);
  * every iteration runs over the word relation, whose size is the
  * DISTINCT vocabulary. Lineage is cut with `localCheckpoint` every
  * `checkpointEvery` merges (the d6 lesson: iterative plans otherwise
  * grow superlinearly). In production BPE is trained on a corpus sample
  * (standard practice — GPT-2's BPE saw ~40 GB); at 100 TB the sampling
  * step (`mixtureSample` / `groupQuota`) feeds this trainer unchanged.
  *
  * Determinism: ties in pair counts break lexicographically (count DESC,
  * pair ASC) — integer counts + string compare, so the merge list is
  * bit-identical on any partitioning/cluster (BpeSpec pins it against a
  * single-machine reference implementation).
  *
  * Words carry an end-of-word marker symbol `</w>` (the Sennrich
  * formulation) so merges can distinguish suffixes from infixes.
  */
object Bpe {

  val EOW = "</w>"

  /** (symbols, frequency) — one row per DISTINCT word. */
  private type WordRow = (Seq[String], Long)

  /** Split a word into per-code-point symbols (surrogate-safe: a
    * supplementary character is ONE symbol, not two broken halves). */
  private[pipeline] def charSymbols(w: String): Seq[String] =
    w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))

  private def wordRelation(df: DataFrame, textCol: String): Dataset[WordRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (charSymbols(w) :+ EOW, n) }
  }

  /** Train `nMerges` merges. Returns the ranked merge list (driver-side:
    * a merge table IS driver-sized — ~50k entries in real vocabularies). */
  def trainMerges(
      df: DataFrame, textCol: String, nMerges: Int,
      checkpointEvery: Int = 10): Seq[(String, String)] = {
    require(nMerges >= 0, "Bpe.trainMerges: nMerges must be >= 0")
    require(checkpointEvery >= 1, "Bpe.trainMerges: checkpointEvery must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordRelation(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < nMerges) {
      val top = words
        .flatMap { case (syms, n) =>
          syms.iterator.sliding(2).withPartial(false)
            .map(p => ((p.head, p(1)), n))
        }
        .groupByKey(_._1)
        .mapValues(_._2).reduceGroups(_ + _)
        .map { case (pair, n) => (pair._1, pair._2, n) }
        .orderBy(col("_3").desc, col("_1"), col("_2"))
        .limit(1)
        .collect()
      if (top.isEmpty) i = nMerges // no adjacent pairs left anywhere
      else {
        val (a, b, _) = top.head
        merges += ((a, b))
        words = words.map { case (syms, n) => (mergeOnce(syms, a, b), n) }
        if ((merges.size % checkpointEvery) == 0) words = words.localCheckpoint()
        i += 1
      }
    }
    merges.toSeq
  }

  /** One left-to-right pass replacing every non-overlapping adjacent
    * (a, b) with a+b — the BPE merge step. */
  def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toSeq
  }

  /** The merge list as a DataFrame (rank, left, right) — the persistable
    * tokenizer artifact. */
  def mergesDF(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Encode: apply the trained merges to every document — merges applied
    * in RANK order per word (the standard greedy BPE encode; equivalent
    * to replaying training on the word). The merge table is a broadcast
    * Map (driver-sized artifact, corpus-scale input): one narrow
    * `mapPartitions`, no shuffle. Output: (idCol, bpe_tokens, n_bpe). */
  def encode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, r) => p -> r }.toMap)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    // null text encodes to zero tokens; a null (or uncastable) id has no
    // addressable row to return — drop it rather than NPE the encoder
    df.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .where(col(idCol).isNotNull)
      .as[(Long, String)](enc)
      .map { case (id, text) =>
        val ranks = bc.value
        val toks = text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
          var syms: Seq[String] = Bpe.charSymbols(w) :+ EOW
          var done = false
          while (!done) {
            // lowest-rank merge present in this word
            var best = -1
            var bestPair: (String, String) = null
            var j = 0
            while (j + 1 < syms.length) {
              val r = ranks.getOrElse((syms(j), syms(j + 1)), -1)
              if (r >= 0 && (best < 0 || r < best)) { best = r; bestPair = (syms(j), syms(j + 1)) }
              j += 1
            }
            if (best < 0) done = true
            else syms = mergeOnce(syms, bestPair._1, bestPair._2)
          }
          syms
        }.toSeq
        (id, toks)
      }
      .toDF(idCol, "bpe_tokens")
      .withColumn("n_bpe", size(col("bpe_tokens")).cast("long"))
  }
}
