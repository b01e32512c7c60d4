package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Document-level text analysis operators (language-ID, quality scoring,
  * token counting, fingerprinting) — driver extension surface. All pure
  * `Column` expressions over one narrow projection: per-document work is
  * embarrassingly parallel, no shuffle anywhere, and the scan reads only
  * (id, text) thanks to column pruning.
  */
object TextAnalysis {

  /** Stopword-hit language ID. Scores each candidate language by hit count
    * of its stopword list; predicted = argmax with a fixed priority order
    * (first in `langs` wins ties). Adds `<lang>_hits` per language and
    * `predicted_lang`. */
  def languageId(df: DataFrame, textCol: String,
      langs: Seq[String] = Seq("en", "de", "fr", "es")): DataFrame = {
    require(langs.nonEmpty && langs.forall(stopwords.contains),
      s"languageId: langs must be among ${stopwords.keys.mkString(",")}")
    val toks = tokens(col(textCol))
    val scored = langs.foldLeft(df)((d, l) =>
      d.withColumn(s"${l}_hits", wordListHits(toks, stopwords(l))))
    // argmax with priority order: lang i wins iff its score >= all later ones
    val predicted = langs.zipWithIndex.init.foldRight(lit(langs.last)) {
      case ((l, i), elseCol) =>
        val beatsRest = langs.drop(i + 1)
          .map(m => col(s"${l}_hits") >= col(s"${m}_hits"))
          .reduce(_ && _)
        when(beatsRest, lit(l)).otherwise(elseCol)
    }
    scored.withColumn("predicted_lang", predicted)
  }

  /** Quality features + a composite score in [0,1]: length signal, token
    * count, mean token length, stopword ratio, punctuation ratio. The
    * formula is deliberately simple arithmetic — deterministic and
    * reproducible by the oracle; swap in a learned scorer via the same
    * column shape. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = size(toks).cast("double")
    val sumTokLen = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val punct = length(regexp_replace(col(textCol), "[a-zA-Z0-9 ]", "")).cast("double")
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_tok_len", sumTokLen / nToks)
      .withColumn("stopword_ratio",
        wordListHits(toks, stopwords("en")).cast("double") / nToks)
      .withColumn("punct_ratio", punct / length(col(textCol)).cast("double"))
      .withColumn("quality",
        lit(0.4) * least(col("stopword_ratio") * 5.0, lit(1.0))
          + lit(0.3) * (lit(1.0) - col("punct_ratio"))
          + lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)))
  }

  /** Token counting three ways: whitespace tokens, BPE-ish regex tokens,
    * distinct whitespace tokens. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("bpe_tokens", bpeTokenCount(col(textCol)).cast("long"))
      .withColumn("distinct_tokens", size(distinctTokens(col(textCol))).cast("long"))

  /** Rolling-hash fingerprint (window-char minimum hash) + window count.
    * Rows shorter than `window` chars are dropped (no fingerprint). */
  def fingerprint(df: DataFrame, textCol: String, window: Int = 16): DataFrame =
    df.where(length(col(textCol)) >= window)
      .withColumn("fingerprint", minHashFingerprint(col(textCol), window))
      .withColumn("n_windows", (length(col(textCol)) - lit(window - 1)).cast("long"))

  /** Sentence segmentation as a pure Column: maximal runs of
    * non-terminator characters plus their trailing `.`/`!`/`?`
    * punctuation, trimmed, empties dropped. The pattern deliberately
    * uses only character classes — no lookbehind (RE2 has none), no
    * abbreviation heuristics — so any engine reproduces the EXACT same
    * split; text after a final unterminated sentence is kept as a
    * sentence of its own. The honest simple splitter: "Dr. Smith"
    * splits at the period, which is the documented tradeoff of every
    * rule-free segmenter. */
  def sentences(c: Column): Column =
    filter(
      transform(regexp_extract_all(c, lit("[^.!?]+[.!?]*"), lit(0)), s => trim(s)),
      s => s =!= "")

  /** Unicode NFC normalization audit face
    * ([[graft.functions.NfcNormalize]]): canonical composition plus the
    * columns a curation pipeline wants next to it — whether the row
    * changed and the before/after code-point counts (combining sequences
    * shrink; NFC never grows a string's char count for canonical text).
    * Run BEFORE hash-based dedup: decomposed and precomposed spellings of
    * the same rendered text otherwise hash apart. Shuffle-free; ASCII
    * rows pass through zero-copy. */
  def normalizeUnicode(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("nfc_text",
        graft.functions.TextExpressionFunctions.nfcNormalize(col(textCol)))
      .withColumn("was_normalized", col("nfc_text") =!= col(textCol))
      .withColumn("n_chars_before", length(col(textCol)).cast("long"))
      .withColumn("n_chars_after", length(col("nfc_text")).cast("long"))

  /** Pairwise vocabulary overlap between corpus groups (sources): exact
    * |distinct_tokens(a) ∩ distinct_tokens(b)| and Jaccard per unordered
    * pair — the corpus-composition diagnostic (how much does source X's
    * vocabulary duplicate source Y's) behind mixture and dedup planning.
    *
    * Shape: one DISTINCT (group, token) relation (vocab×groups-sized —
    * at corpus scale this is the vocabulary relation, not the corpus),
    * one token-keyed self-join producing ≤ groups²/2 pair rows per
    * token, one pair-keyed count, union sizes via |A|+|B|−|A∩B|. Exact
    * is right while the group count is small (sources, languages); for
    * millions of groups the mergeable-sketch family (a2's HLL per
    * group + inclusion–exclusion, or theta sketches) is the documented
    * swap. */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ts = graft.CacheRegistry.persisted(
      df.select(col(groupCol).as("__g"), explode(tokens(col(textCol))).as("__tok"))
        .where(col("__tok") =!= "").distinct())
    val counts = ts.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val inter = ts.select(col("__g").as("source_a"), col("__tok"))
      .join(ts.select(col("__g").as("source_b"), col("__tok")), Seq("__tok"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_tokens"))
    inter
      .join(counts.select(col("__g").as("source_a"), col("__n").as("__na")), Seq("source_a"))
      .join(counts.select(col("__g").as("source_b"), col("__n").as("__nb")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared_tokens"),
        round(col("n_shared_tokens").cast("double")
          / (col("__na") + col("__nb") - col("n_shared_tokens")).cast("double"), 9)
          .as("jaccard"))
  }

  /** Readability scores — Flesch Reading Ease and Flesch–Kincaid grade
    * (Kincaid et al. 1975), a standard document-quality signal next to
    * [[qualityScore]]. Counting rules (all deterministic, regex in the
    * portable Java∩RE2 subset):
    *   sentences  = runs split on `[.!?]+` with non-blank content (min 1
    *                in the formulas — a fragment is one sentence)
    *   words      = tokens after collapsing ALL whitespace (newlines,
    *                tabs) to single spaces, lowercasing, and stripping
    *                non-[a-z0-9 ] — so `foo\nbar` is two words, not a
    *                fused `foobar`
    *   syllables  = vowel-group count `[aeiouy]+` per word, min 1
    * The syllable rule is the classic cheap heuristic (±1 on silent-e
    * words) — readability filters threshold coarsely, exactness of the
    * English syllabary is not the point. Pure per-row expression work,
    * shuffle-free; rows with zero words are dropped (no defined score).
    * Scores surface rounded at 9 dp. */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val sents = filter(split(col(textCol), "[.!?]+"), s => trim(s) =!= "")
    val words = filter(
      split(regexp_replace(
        lower(regexp_replace(col(textCol), "[ \\t\\n\\x0B\\f\\r]+", " ")), "[^a-z0-9 ]", ""), " "),
      w => w =!= "")
    val nS = greatest(size(col("__sents")), lit(1)).cast("double")
    val nW = size(col("__words")).cast("double")
    val syl = aggregate(col("__words"), lit(0L), (acc, w) =>
      acc + greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1))
        .cast("long"))
    val wps = nW / nS
    val spw = col("__syl").cast("double") / nW
    df.withColumn("__sents", sents).withColumn("__words", words)
      .where(size(col("__words")) >= 1)
      .withColumn("__syl", syl)
      .withColumn("n_sentences", size(col("__sents")).cast("long"))
      .withColumn("n_words", size(col("__words")).cast("long"))
      .withColumn("n_syllables", col("__syl"))
      .withColumn("fre",
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 9))
      .withColumn("fk_grade",
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 9))
      .drop("__sents", "__words", "__syl")
  }
}
