package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators: deterministic global shuffle +
  * sharding, sequence packing, and weighted mixture sampling — the last
  * mile between a curated corpus and a training loader. Driver extension
  * surface (the reference has no notion of any of this, SURVEY §2.12).
  *
  * Everything is keyed on md5-derived uniform hashes, so results are
  * reproducible across runs, engines, and cluster sizes — the property
  * that makes a training run auditable ("which exact documents were in
  * shard 17 of run 42?"). No randomness, no `rand()`: `rand(seed)` is
  * partitioning-dependent in Spark, a silent reproducibility killer.
  *
  * Scale shape: the only shuffle in this module is the per-shard window
  * (and the tiny per-source aggregate in sampling). Shard count is the
  * parallelism knob — at 100 TB pick nShards so one shard (corpus/nShards)
  * fits an executor's sort budget; the shard hash is uniform so skew is
  * bounded by the birthday inequality, not by data distribution.
  */
object TrainingPrep {

  /** First 32 bits of md5 as a non-negative long — the engine-portable
    * uniform hash (any engine: parse 8 hex chars). 8 hex chars stay well
    * inside a signed 64-bit parse (NOTES: 16 would overflow). */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic uniform [0,1) from a key and a salt: hash32 / 2^32.
    * One IEEE division of an exact integer — bit-identical everywhere. */
  def uniform01(c: Column, salt: String): Column =
    hash32(concat(c.cast("string"), lit("#" + salt))) / lit(4294967296.0)

  /** Deterministic global shuffle + fixed-count sharding:
    *  - `shard` = hash32(id) mod nShards — uniform, data-independent
    *  - `pos`   = rank of md5(id) within the shard (id tie-break)
    * A training reader consumes shards independently; within-shard md5
    * order IS the shuffle (documents that were adjacent in the source are
    * scattered across shards and positions). The window sorts one shard
    * per task — nShards is the scale knob, not the corpus size. */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "shuffleShard: nShards >= 1")
    val byHash = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("shard", pmod(hash32(col(idCol)), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(byHash).cast("long"))
  }

  /** Offset-bucket sequence packing: documents (already sharded) are laid
    * out in shuffle order; each document's `start_offset` is the running
    * token count before it, and `example_id` = start_offset div seqLen —
    * i.e. examples are fixed `seqLen`-token windows over the concatenated
    * shard stream (the standard "pack then split" training layout; a doc
    * spanning a boundary is attributed to the example it starts in).
    * Integer window arithmetic only — no float accumulation anywhere. */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String, shardCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, "packSequences: seqLen >= 1")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("example_id",
        floor(col("start_offset") / lit(seqLen.toDouble)).cast("long"))
  }

  /** Document-boundary emission for [[packSequences]]' layout — the
    * attention-mask detail of packing: a loader that packs documents into
    * fixed windows needs, PER EXAMPLE, the ordered document segments
    * inside it (to build block-diagonal attention masks / reset position
    * ids at boundaries). A doc at running offset S with n tokens spans
    * examples ⌊S/len⌋..⌊(S+n−1)/len⌋ and contributes the clipped segment
    * [max(S, e·len), min(S+n, (e+1)·len)) to each, in within-example
    * coordinates. Zero-token docs contribute nothing (and would run the
    * `sequence` descending — the NOTES trap). Same window as
    * [[packSequences]] plus a pure-expression explode: integer
    * arithmetic only, engine-replicable. Output: (shardCol, example_id,
    * idCol, seg_start, seg_end); consumers order by (example_id,
    * seg_start). */
  def packBoundaries(
      df: DataFrame, idCol: String, tokenCol: String, shardCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, "packBoundaries: seqLen >= 1")
    val len = lit(seqLen.toLong)
    val packed = packSequences(df, idCol, tokenCol, shardCol, seqLen)
      .where(col(tokenCol) > 0)
    val e0 = floor(col("start_offset") / lit(seqLen.toDouble)).cast("long")
    val e1 = floor((col("start_offset") + col(tokenCol) - 1) / lit(seqLen.toDouble))
      .cast("long")
    packed
      .select(col(shardCol), col(idCol), col("start_offset"),
        col(tokenCol).cast("long").as("__n"),
        explode(sequence(e0, e1)).as("example_id"))
      .select(col(shardCol), col("example_id"), col(idCol),
        greatest(col("start_offset") - col("example_id") * len, lit(0L)).as("seg_start"),
        (least(col("start_offset") + col("__n"), (col("example_id") + 1) * len)
          - col("example_id") * len).as("seg_end"))
  }

  /** Deterministic train/validation/test split: `u = uniform01(id)`
    * against cumulative fraction thresholds — reproducible on any
    * engine/cluster/run (no `rand()`), stable under reprocessing (a doc
    * keeps its split forever, the property leakage audits depend on).
    * Fractions must sum to 1; assignment is first-match on the cumulative
    * boundary. A null id gets a NULL split (surfaced, not silently
    * classified into the last bucket). */
  def hashSplit(
      df: DataFrame, idCol: String, salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"hashSplit: fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val u = uniform01(col(idCol), salt)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val expr0 = fractions.zip(cum).init.foldRight(
      lit(fractions.last._1): Column) { case (((name, _), bound), rest) =>
      when(u < bound, name).otherwise(rest)
    }
    df.withColumn("split", when(col(idCol).isNotNull, expr0))
  }

  /** Fixed-token-window document chunking with overlap — the context-
    * window prep step (pretraining max-seq-len splitting, RAG chunking):
    * token windows of `chunkTokens` starting every `chunkTokens -
    * overlap` tokens, so consecutive chunks share `overlap` tokens and
    * no token is dropped. Pure Column expressions over a MATERIALIZED
    * token array (the HOF lesson: `slice` over a recomputed `split`
    * re-tokenizes per chunk): shuffle-free, linear, one output row per
    * chunk. The trailing chunk may be short; a doc shorter than one
    * chunk yields exactly one chunk. Output: (idCol, chunk_id,
    * chunk_text, n_chunk_tokens). */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      s"chunkDocuments: need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // starts 0, stride, 2*stride, ... while start < n (sequence is
      // inclusive of the bound, so bound = n-1; __n >= 1 always: even
      // split("") is [""])
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      .select(
        col(idCol),
        (col("__s") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__s") + 1, lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong), col("__n") - col("__s")).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Frequency vocabulary: the `size` highest-document-frequency tokens,
    * with dense ids 1..size assigned by (df DESC, token ASC) — fully
    * deterministic, no hash collisions, reproducible by any engine.
    *
    * The distinct-token relation of a web corpus is NOT small (typos,
    * URLs, ids — billions of rows), so the top-`size` selection is
    * `orderBy().limit()` — Spark's distributed TakeOrdered: each
    * partition ships only its local top `size`, nothing global is
    * sorted. Only the ≤ size survivors pass through the single-partition
    * ranking window that assigns dense ids; (df, tok) is a total order,
    * so limit-then-rank picks exactly the rows a global rank-then-filter
    * would. The corpus itself flows through one partial-aggregated
    * distinct + count shuffle. */
  def buildVocab(df: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size >= 1, "buildVocab: size >= 1")
    val byDf = Window.orderBy(col("df").desc, col("tok"))
    df.select(explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(size)
      .withColumn("id", row_number().over(byDf).cast("long"))
  }

  /** Vocabulary application: token → dense id per position, the
    * id-ification step between curation and [[packSequences]]. The
    * vocabulary is broadcast (vocabularies are ~10⁵ entries; corpora are
    * TBs) and joined against the exploded (doc, pos, token) stream;
    * per-document id arrays are reassembled POSITION-SORTED inside the
    * aggregate — `collect_list` alone is shuffle-order-nondeterministic,
    * which would silently scramble training text. Out-of-vocabulary
    * tokens map to `unkId`. Output: (id, n_toks, ids). */
  def tokenizeToIds(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      unkId: Long = 0L): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .join(broadcast(vocab.select(col("tok"), col("id"))), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        array_sort(collect_list(struct(col("pos"),
          coalesce(col("id"), lit(unkId)).as("id")))).as("pi"))
      .select(col(idCol), col("n_toks"),
        transform(col("pi"), x => x.getField("id")).as("ids"))

  /** Curriculum staging: assign each row to one of `nStages` stages by
    * exact score quantiles — stage 1 holds the lowest-scoring quartile (at
    * nStages = 4) and so on; a loader then feeds stages in order
    * (easy→hard or low→high quality, Bengio et al. 2009). Boundaries are
    * the interpolated percentiles at j/nStages; a score EQUAL to a
    * boundary stays in the lower stage (strict > moves it up).
    *
    * Scale shape: ONE aggregate produces the (nStages−1)-element threshold
    * array, re-joined as a broadcast single row inside the same plan (no
    * driver-side action — the t8 lesson); assignment is then a pure
    * projection. The exact `percentile` sort-based agg is the sf-test
    * form; at 100 TB swap in `percentile_approx` (t-digest, mergeable,
    * one pass) — the assignment side is unchanged. */
  def curriculum(df: DataFrame, scoreCol: String, nStages: Int): DataFrame = {
    require(nStages >= 1, "curriculum: nStages >= 1")
    if (nStages == 1) return df.withColumn("stage", lit(1))
    val fracs = (1 until nStages).map(j => j.toDouble / nStages).mkString(", ")
    val thrs = df.agg(expr(s"percentile($scoreCol, array($fracs))").as("__thr"))
    df.crossJoin(broadcast(thrs))
      .withColumn("stage", (lit(1) + aggregate(col("__thr"), lit(0),
        (acc, t) => acc + when(col(scoreCol) > t, 1).otherwise(0))).cast("int"))
      .drop("__thr")
  }

  /** Weighted mixture sampling: keep a row iff its salted uniform hash is
    * under `weight` (a per-row Column in [0,1], typically derived from the
    * source). Adds `u` and boolean `sampled` rather than filtering, so a
    * pipeline can audit the decision; filter on `sampled` to apply it.
    * Exactly reproducible: the same document survives in every run. */
  def mixtureSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.withColumn("u", uniform01(col(idCol), "mix"))
      .withColumn("sampled", col("u") < weight)

  /** Weighted mixture with UPSAMPLING — the "epochs over source" mixture
    * of real LLM training recipes (a high-quality source with weight 2.7
    * appears twice, and a deterministic 70% of its documents a third
    * time). Emits one row per copy with a 0-based `copy` index so
    * downstream [[shuffleShard]]/packing keyed by (id, copy) treats
    * copies as distinct training examples instead of collapsing them.
    * weight < 1 degrades exactly to [[mixtureSample]]'s keep decision
    * (same salted hash, same threshold): 0 or 1 copies. A null weight
    * means zero copies — the row is dropped, like weight 0 (callers that
    * need the keep/drop decision visible per row use [[mixtureSample]]'s
    * auditable form). Shuffle-free — floor + explode(sequence)
    * projection; output size is sum(weight), which is the point. */
  def mixtureRepeat(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    require(!df.columns.contains("copy") && !df.columns.contains("__n"),
      "mixtureRepeat: input must not already carry a copy/__n column")
    val n = floor(weight).cast("long") +
      when(uniform01(col(idCol), "mix") < (weight - floor(weight)), 1L).otherwise(0L)
    df.withColumn("__n", n)
      .where(col("__n") > 0) // null weight -> null __n -> dropped (0 copies)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Temperature-scaled source mixture weights — the multilingual /
    * multi-source rebalancing rule of mT5 (Xue et al. 2021 §3.1) and the
    * Gopher/PaLM recipes: sample source i proportionally to p_i^(1/T)
    * instead of its natural share p_i (T>1 flattens toward uniform, T=1
    * is natural, T<1 sharpens). Emits one row per source:
    * `n_docs`, natural share `p`, target share `q = p^(1/T)/Σp^(1/T)`,
    * and `sample_weight = q·total/n` — the per-row expected copy count
    * that [[mixtureSample]]/[[mixtureRepeat]] consume directly (join it
    * back on the source column, broadcast: the table is sources-sized).
    *
    * q and sample_weight are rounded to 9 dp (the normalizer Σp^(1/T)
    * accumulates in engine-dependent order; pow differs in the last
    * ulp across libms); `p` is a single IEEE division — exact. Scale
    * shape: one sources-sized count aggregate; totals and the
    * normalizer travel as broadcast 1-row relations. */
  def temperatureWeights(
      df: DataFrame, sourceCol: String, temperature: Double): DataFrame = {
    require(temperature > 0.0,
      s"temperatureWeights: temperature must be > 0, got $temperature")
    val alpha = 1.0 / temperature
    val c = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).as("total"))
    val s = c.crossJoin(broadcast(tot))
      .withColumn("p", col("n").cast("double") / col("total").cast("double"))
      .withColumn("pa", pow(col("p"), lit(alpha)))
    val z = s.agg(sum(col("pa")).as("z"))
    s.crossJoin(broadcast(z))
      .select(col(sourceCol), col("n").as("n_docs"), col("p"),
        (round(col("pa") / col("z"), 9) + lit(0.0)).as("q"),
        (round(col("pa") / col("z") * col("total").cast("double")
          / col("n").cast("double"), 9) + lit(0.0)).as("sample_weight"))
  }

  /** Power-of-two length bucketing — the dynamic-batching prep of real
    * training loaders (batch sequences of similar length together so the
    * pad-to-longest waste stays bounded) and the padding-waste audit that
    * justifies it: per bucket, the fraction of a pad-to-cap batch that
    * would be padding. One shuffle (bucket-count-sized partial agg);
    * bucket = ceil(log2(n_tokens)), cap = 2^bucket. Empty/whitespace
    * documents land in bucket 0 (split yields one empty token).
    *
    * The bucket is computed INTEGRALLY — bit-width of (n-1), i.e.
    * `length(bin(n-1))`, with n <= 1 pinned to 0 — never through floating
    * log2: `ln(x)/ln(2)` can land a hair above an exact integer at
    * power-of-two inputs (Java log(2^29)/log(2) = 29.000000000000004),
    * where a different libm (DuckDB's std::log2) is exact, flipping
    * `ceil` a whole bucket apart on the SAME count. Integer logic is
    * engine-invariant by construction; the cap is `1 << bucket` for the
    * same reason. */
  def lengthBuckets(df: DataFrame, textCol: String): DataFrame = {
    val n = size(split(col(textCol), " ")).cast("long")
    df.withColumn("__n", n)
      .withColumn("bucket",
        when(col("__n") <= 1L, 0)
          .otherwise(length(bin(col("__n") - 1L))).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("sum_toks"),
        max(col("__n")).as("max_toks"))
      .withColumn("cap", expr("shiftleft(1L, bucket)"))
      .withColumn("padding_frac",
        round(lit(1.0) - col("sum_toks") / (col("n_docs") * col("cap")), 9))
  }

  /** Per-group quota: cap any one group's contribution at `quota` rows —
    * the domain/source cap of web-corpus curation (no single site may
    * dominate the training mix). Deterministic: the kept rows are the
    * `quota` smallest by (md5(id), id) within each group, so the same
    * documents survive in every run, on any cluster, in any engine.
    *
    * Selection runs through the bounded mergeable buffer
    * ([[graft.folds.Aggregators.bottomK]]): at most `quota` (hash, id)
    * entries per group per partition cross the shuffle. The window
    * `row_number` formulation would shuffle AND sort every row of every
    * group — at 100 TB a hot domain IS the skew case this operator
    * exists for, and the bounded buffer caps exactly that hot key's
    * shuffle volume. Output: (idCol, groupCol), kept rows only. */
  def groupQuota(df: DataFrame, idCol: String, groupCol: String, quota: Int): DataFrame = {
    require(quota >= 1, "groupQuota: quota >= 1")
    val pick = graft.folds.Aggregators.asColumn(
      graft.folds.Aggregators.bottomK[(String, Long)](quota),
      md5(col(idCol).cast("string")), col(idCol))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    // a null id has no deterministic order position (and would NPE the
    // buffer ordering) — excluded, like null keys in any selection op
    df.where(col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(pick.as("__picked"))
      .select(col(groupCol), explode(col("__picked")).as("__e"))
      .select(col("__e._2").as(idCol), col(groupCol))
  }

  /** SENTENCE-AWARE chunking — the RAG/pretraining chunker that never
    * splits a sentence: documents are segmented
    * ([[graft.text.TextAnalysis.sentences]]) and each sentence lands in
    * chunk `floor(chars-before-it / maxChars)` — cumulative-threshold
    * assignment, so boundaries fall between sentences and a chunk may
    * overflow `maxChars` by at most one sentence (the documented
    * approximation; a greedy reset-on-overflow rule needs a sequential
    * scan no window expresses, and this definition is reproducible as a
    * plain window in ANY engine). Contrast [[chunkDocs]], which windows
    * TOKENS exactly but cuts mid-sentence. Chunk text rejoins the
    * sentences with single spaces (original inter-sentence whitespace
    * is not preserved).
    *
    * One shuffle on the doc key + one in-partition sort (the window),
    * then the chunk groupBy reuses the same partitioning — the x4/x33
    * window shape. */
  def sentenceChunks(
      df: DataFrame, idCol: String, textCol: String, maxChars: Int): DataFrame = {
    require(maxChars >= 1, "sentenceChunks: maxChars >= 1")
    val w = Window.partitionBy(col(idCol)).orderBy(col("sent_idx"))
    df.select(col(idCol),
        posexplode(graft.text.TextAnalysis.sentences(col(textCol)))
          .as(Seq("sent_idx", "sentence")))
      .withColumn("__cum_before",
        sum(length(col("sentence")).cast("long")).over(w) -
          length(col("sentence")).cast("long"))
      .withColumn("chunk_id", expr(s"__cum_before div $maxChars"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        array_sort(collect_list(struct(col("sent_idx"), col("sentence")))).as("ss"))
      .select(col(idCol), col("chunk_id"), col("n_sentences"),
        concat_ws(" ", transform(col("ss"), x => x.getField("sentence"))).as("chunk_text"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): for a
    * deterministic 1/`rateDenom` of documents, two character cut points
    * split the text into prefix/middle/suffix and the document is
    * re-serialized in PSM order — `‹pre› prefix ‹suf› suffix ‹mid› middle`
    * — so an autoregressive model learns infilling; the rest pass through
    * unchanged (the paper trains on a mixture).
    *
    * Deterministic and engine-portable: the FIM decision and both cuts
    * derive from [[hash32]] of the id under distinct salts (mod len+1, so
    * empty prefix/middle/suffix all occur), making the transform
    * content-stable across runs and SQL-replicable — pure substring
    * arithmetic, the split char level like the paper's default. `cut_lo`
    * / `cut_hi` are surfaced (null when not applied) so downstream loss
    * masking can find the sentinel spans without re-deriving them.
    * Shuffle-free projection — scale-trivial. */
  def fimTransform(
      df: DataFrame, idCol: String, textCol: String, rateDenom: Int = 2,
      pre: String = "<PRE>", suf: String = "<SUF>", mid: String = "<MID>"): DataFrame = {
    require(rateDenom >= 1, "fimTransform: rateDenom >= 1")
    val text = col(textCol)
    val len = length(text).cast("long")
    def salted(salt: String): Column =
      hash32(concat(col(idCol).cast("string"), lit("#" + salt)))
    val isFim = pmod(salted("fim"), lit(rateDenom.toLong)) === 0L
    val c1 = pmod(salted("fim_a"), len + 1L)
    val c2 = pmod(salted("fim_b"), len + 1L)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    df.withColumn("fim_applied", isFim)
      .withColumn("cut_lo", when(isFim, lo))
      .withColumn("cut_hi", when(isFim, hi))
      .withColumn("fim_text",
        when(isFim, concat(
          lit(pre), text.substr(lit(1L), lo),
          lit(suf), text.substr(hi + 1L, len),
          lit(mid), text.substr(lo + 1L, hi - lo)))
          .otherwise(text))
  }

  /** SFT chat-template rendering: serialize a conversation — an ordered
    * `array<struct<role, content>>` column — into training text with
    * role sentinels, AND emit the loss-mask spans (the detail that makes
    * SFT data prep subtle: loss is taken only on assistant tokens, so
    * the renderer must report exactly where assistant content landed).
    *
    * Template per turn: `<|role|>\n` + content + `<|end|>\n`. Output
    * columns: `chat_text`, `n_turns`, `mask_spans`, `mask_spans_bytes`
    * — arrays of (s, e) half-open 0-based offsets covering each
    * assistant turn's content (headers and sentinels are never
    * loss-bearing), in TWO unit systems because consumers genuinely
    * split on this:
    *   - `mask_spans`: UNICODE CODE POINTS (Spark's `length()` unit) —
    *     slice with `offsetByCodePoints` (JVM) / native `str` indexing
    *     (Python 3). NOT UTF-16 units: Java/JS `substring` semantics
    *     mis-place masks the moment a turn contains a non-BMP
    *     character (emoji) — spec-pinned with an astral-plane case.
    *   - `mask_spans_bytes`: UTF-8 BYTES (`octet_length` unit) — most
    *     training stacks tokenize raw UTF-8 and slice `bytes` objects;
    *     spec-pinned against byte-slicing the UTF-8 encoding directly.
    * Null roles/contents render as empty strings (a malformed turn
    * must not null the whole rendering).
    *
    * One `aggregate` fold over the turns array per row — integer length
    * arithmetic in both units, so offsets are exact and
    * engine-reproducible; pure expression work, shuffle-free at any
    * scale. */
  def renderChatTemplate(df: DataFrame, turnsCol: String): DataFrame = {
    val zero = struct(lit("").as("txt"),
      array().cast("array<struct<s:long,e:long>>").as("spans"),
      lit(0L).as("clen"), lit(0L).as("blen"),
      array().cast("array<struct<s:long,e:long>>").as("bspans"))
    val folded = aggregate(col(turnsCol), zero, (acc, t) => {
      val role = coalesce(t.getField("role"), lit(""))
      val content = coalesce(t.getField("content"), lit(""))
      val header = concat(lit("<|"), role, lit("|>\n"))
      // running length counters in BOTH units: re-measuring the
      // accumulated text each step would be O(turns x text) per row
      val start = acc.getField("clen") + length(header).cast("long")
      val end = start + length(content).cast("long")
      val bstart = acc.getField("blen") + octet_length(header).cast("long")
      val bend = bstart + octet_length(content).cast("long")
      val txt2 = concat(acc.getField("txt"), header, content, lit("<|end|>\n"))
      val clen2 = end + length(lit("<|end|>\n")).cast("long")
      val blen2 = bend + octet_length(lit("<|end|>\n")).cast("long")
      val isAssistant = role === "assistant"
      val spans2 = when(isAssistant,
        concat(acc.getField("spans"), array(struct(start.as("s"), end.as("e")))))
        .otherwise(acc.getField("spans"))
      val bspans2 = when(isAssistant,
        concat(acc.getField("bspans"), array(struct(bstart.as("s"), bend.as("e")))))
        .otherwise(acc.getField("bspans"))
      struct(txt2.as("txt"), spans2.as("spans"),
        clen2.as("clen"), blen2.as("blen"), bspans2.as("bspans"))
    })
    df.withColumn("__r", folded)
      .withColumn("chat_text", col("__r.txt"))
      .withColumn("n_turns", size(col(turnsCol)))
      .withColumn("mask_spans", col("__r.spans"))
      .withColumn("mask_spans_bytes", col("__r.bspans"))
      .drop("__r")
  }

  /** Weighted sampling WITHOUT replacement, n per group — Efraimidis &
    * Spirakis 2006 (A-ES): each row draws a uniform u and is ranked by
    * the exponential key −ln(u)/w; the n smallest keys are an exact
    * weighted sample without replacement. Deterministic like everything
    * here: u comes from the row id's md5 prefix ((v+1)/(2^32+1) ∈ (0,1)),
    * not `rand()`, so the same documents are drawn in every run, on any
    * cluster, in any engine — and an auditor can recompute the draw.
    * The key is rounded to 9 dp before ranking (ln is the one
    * libm-vs-JVM divergent op — the t16 lesson) with the id as the tie
    * break, so selection is engine-reproducible.
    *
    * One pass, one per-group aggregate: at most n (key, id) entries per
    * group per partition cross the shuffle ([[graft.folds.Aggregators
    * .bottomK]] — the [[groupQuota]] argument: a window `row_number`
    * would shuffle-and-sort the full corpus). Rows with null ids or
    * non-positive weights are excluded (no valid draw exists for them).
    * Output: (groupCol, idCol, sample_rank) with rank 1 = smallest key. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "weightedSample: n >= 1")
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (v + lit(1.0)) / lit(4294967297.0)
    val key = round(-log(u) / col(weightCol).cast("double"), 9)
    val pick = graft.folds.Aggregators.asColumn(
      graft.folds.Aggregators.bottomK[(Double, Long)](n),
      key, col(idCol).cast("long"))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    df.where(col(idCol).isNotNull && col(weightCol).cast("double") > 0.0)
      .groupBy(col(groupCol))
      .agg(pick.as("__picked"))
      .select(col(groupCol), posexplode(col("__picked")).as(Seq("__i", "__e")))
      .select(col(groupCol), col("__e._2").as(idCol),
        (col("__i") + 1).cast("int").as("sample_rank"))
  }
}
