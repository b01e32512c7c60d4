package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al. 2003) of a string, as ONE
  * codegen'd expression: md5-hash every `kgram`-char window, keep each
  * `window`-hash sliding minimum, return the distinct minima in first-
  * occurrence order.
  *
  * Bit-identical to the higher-order-function formulation
  * (`array_distinct(transform(..., i -> array_min(slice(khashes, i, w))))`
  * over `md5(substr(text, i, kgram))`) and to the equivalent DuckDB SQL —
  * hex md5 strings compare lexicographically the same everywhere. The HOF
  * version is interpreted per element (one lambda dispatch + one slice
  * copy per position, one md5 per position through Column machinery):
  * measured 7.6 s at sf0.1 where this compiled single pass is ~0.5 s.
  * Character (not byte) windows, so multibyte text hashes the same
  * substrings `substr` would produce.
  */
case class WinnowFingerprints(child: Expression, kgram: Int, window: Int)
    extends UnaryExpression {

  require(kgram >= 1 && window >= 1, "WinnowFingerprints: kgram, window >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_fingerprints"

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Called from both interpreted eval and generated code. Returns null
    * (not an empty array) when the text is shorter than one k-gram, so
    * the too-short case is distinguishable from no-fingerprints.
    *
    * Hashes are compared as raw digest bytes (unsigned byte order ==
    * lexicographic order of the lowercase-hex rendering, each byte maps
    * to two ordered hex chars) and rendered to hex only when a window's
    * minimum CHANGES — the classic winnowing record-on-change rule: the
    * same minimum survives ~`window` consecutive windows, so only
    * ~2/(window+1) of positions pay the hex conversion. ASCII payloads
    * (byte count == char count) hash straight from the underlying bytes
    * with no per-position substring allocation. */
  def fingerprints(t: UTF8String): ArrayData = {
    val nChars = t.numChars()
    val nGrams = nChars - kgram + 1
    if (nGrams < 1) return null
    val md = MessageDigest.getInstance("MD5")
    val ascii = t.numBytes() == nChars
    val bytes = if (ascii) t.getBytes else null
    val khashes = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      if (ascii) md.update(bytes, i, kgram)
      else md.update(t.substring(i, i + kgram).getBytes)
      khashes(i) = md.digest()
      i += 1
    }
    val nWins = nGrams - window + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var prev: Array[Byte] = null
    var w = 0
    while (w < math.max(nWins, 0)) {
      var min = khashes(w)
      var j = w + 1
      while (j < w + window) {
        if (java.util.Arrays.compareUnsigned(khashes(j), min) < 0) min = khashes(j)
        j += 1
      }
      // same array object as the previous window's min → already recorded
      if (min ne prev) {
        val hex = new Array[Byte](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = hexDigits((min(b) >> 4) & 0xf).toByte
          hex(2 * b + 1) = hexDigits(min(b) & 0xf).toByte
          b += 1
        }
        seen.add(UTF8String.fromBytes(hex))
        prev = min
      }
      w += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(t: Any): Any =
    fingerprints(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = $ref.fingerprints($t);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Global minimum window-hash document fingerprint as ONE codegen'd
  * expression (r14): md5-hash every `window`-char substring, return the
  * lexicographically smallest hex digest — the value
  * `array_min(transform(sequence(1, len-window+1), i -> md5(substr(text,
  * i, window))))` computes, without the per-position interpreted lambda
  * dispatch, Column-machinery md5, and substring allocation of the HOF
  * form (the [[WinnowFingerprints]] lesson applied to
  * [[graft.text.TextFunctions.minHashFingerprint]] / t4). Digests are
  * compared as raw bytes — unsigned byte order equals the lexicographic
  * order of the lowercase-hex rendering — and only the final minimum is
  * hex-rendered. ASCII payloads hash straight from the UTF-8 bytes with
  * zero per-position allocation; multibyte text falls back to per-window
  * `substring` so the hashed bytes are exactly what `substr` would
  * produce. Returns null when the text is shorter than `window` chars
  * (the HOF form's caller filters those rows out first).
  */
case class MinWindowMd5(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, "MinWindowMd5: window >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_window_md5"

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Called from both interpreted eval and generated code. */
  def minHash(t: UTF8String): UTF8String = {
    val nChars = t.numChars()
    val nGrams = nChars - window + 1
    if (nGrams < 1) return null
    val md = MessageDigest.getInstance("MD5")
    val ascii = t.numBytes() == nChars
    val bytes = if (ascii) t.getBytes else null
    var min: Array[Byte] = null
    var i = 0
    while (i < nGrams) {
      if (ascii) md.update(bytes, i, window)
      else md.update(t.substring(i, i + window).getBytes)
      val d = md.digest()
      if (min == null || java.util.Arrays.compareUnsigned(d, min) < 0) min = d
      i += 1
    }
    val hex = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = hexDigits((min(b) >> 4) & 0xf).toByte
      hex(2 * b + 1) = hexDigits(min(b) & 0xf).toByte
      b += 1
    }
    UTF8String.fromBytes(hex)
  }

  override protected def nullSafeEval(t: Any): Any =
    minHash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minWindowMd5", this, classOf[MinWindowMd5].getName)
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = $ref.minHash($t);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinWindowMd5 =
    copy(child = newChild)
}

/** Aho-Corasick multi-pattern matcher (Aho & Corasick 1975) as ONE
  * codegen'd expression: count every occurrence of every pattern
  * (all start positions, overlapping included) in a single pass over the
  * text, independent of pattern count.
  *
  * The 100 TB blocklist shape: content filtering against a term list
  * (NSFW/spam/PII term screens in the C4/RefinedWeb/Dolma pipelines) is
  * k `contains()` scans per document the naive way — O(k·n) per doc and
  * k Column expressions in the plan. This automaton is O(n + matches)
  * per doc and O(1) plan size: the goto/fail/output tables live in ONE
  * reference object shared by every task (the [[NearestCentroids]]
  * lesson: large reference state must not be unrolled into the plan).
  *
  * Returns struct(total_hits BIGINT, matched ARRAY<STRING>) with
  * `matched` the lexicographically sorted distinct patterns that occur —
  * deterministic, and SQL-replicable per pattern as the count of start
  * positions `i` where `substr(text, i, len(p)) = p`.
  */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "MultiPatternHits: need >= 1 non-empty pattern")
  require(patterns.distinct == patterns,
    "MultiPatternHits: duplicate patterns would double-count — deduplicate")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("total_hits",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("matched",
      ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_multi_pattern_hits"

  /** The automaton, fully determinized for the hot path: a dense
    * `states × 128` int table carries EVERY transition (goto ∪ fail
    * resolution, computed in BFS order — delta[s][c] = delta[fail(s)][c]
    * when s has no c-edge) for ASCII chars, so the scan loop is one array
    * load per char with no boxing and no fail-walking. Non-ASCII pattern
    * chars go through a per-state HashMap with the classic lazy fail walk
    * (rare by construction); a text char with no edges anywhere can reach
    * no pattern state and resets to root. Built once per executor
    * (transient lazy), never serialized into the plan. Outputs are merged
    * down the fail chain at build time (a state's fail link is finalized
    * before the state itself in BFS order). */
  @transient private lazy val automaton: MultiPatternHits.Automaton = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for ((p, pid) <- patterns.zipWithIndex) {
      var s = 0
      for (c <- p) {
        val nxt = gotoMaps(s).get(c)
        if (nxt == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          outs += Nil
          gotoMaps(s).put(c, gotoMaps.size - 1)
          s = gotoMaps.size - 1
        } else s = nxt
      }
      outs(s) = pid :: outs(s)
    }
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Int]()
    gotoMaps(0).forEach { (_, v) => fail(v) = 0; queue.add(v) }
    val bfs = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (!queue.isEmpty) {
      val u = queue.poll()
      bfs += u
      gotoMaps(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fail(f)
        val fv = gotoMaps(f).get(c)
        fail(v) = if (fv != null && fv.intValue() != v) fv.intValue() else 0
        outs(v) = outs(v) ++ outs(fail(v))
      }
    }
    // determinize ASCII: root row first, then children inherit their fail
    // row for absent edges (BFS order guarantees the fail row is final)
    val delta = Array.fill(n * 128)(0)
    gotoMaps(0).forEach { (c, v) => if (c < 128) delta(c.charValue()) = v.intValue() }
    for (u <- bfs if u != 0) {
      val base = u * 128
      val failBase = fail(u) * 128
      var c = 0
      while (c < 128) { delta(base + c) = delta(failBase + c); c += 1 }
      gotoMaps(u).forEach { (c, v) => if (c < 128) delta(base + c.charValue()) = v.intValue() }
    }
    // keep only non-ASCII edges in the fallback maps
    val wide = gotoMaps.map { m =>
      val w = new java.util.HashMap[Character, Integer]()
      m.forEach { (c, v) => if (c >= 128) w.put(c, v) }
      if (w.isEmpty) null else w
    }.toArray
    val anyWide = wide.exists(_ != null)
    MultiPatternHits.Automaton(delta, fail, outs.map(_.toArray).toArray, wide, anyWide)
  }

  // matched-pattern output order: code-point collation, matching the
  // list_sort/ORDER BY order of both engines (NOT Java's UTF-16 order)
  @transient private lazy val sortedIdx: Array[Int] =
    patterns.indices.sortBy(patterns)(graft.core.Utf8Order.ordering).toArray
  @transient private lazy val patternUtf8: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  /** Called from both interpreted eval and generated code. */
  def hits(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val a = automaton
    val delta = a.delta
    val outs = a.outs
    val counts = new Array[Long](patterns.size)
    var total = 0L
    val s = t.toString
    val len = s.length
    var state = 0
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c < 128) state = delta(state * 128 + c)
      else if (!a.anyWide) state = 0
      else {
        // lazy fail walk through the sparse non-ASCII edges
        var st = state
        var nxt: Integer = if (a.wide(st) == null) null else a.wide(st).get(c)
        while (nxt == null && st != 0) {
          st = a.fail(st)
          nxt = if (a.wide(st) == null) null else a.wide(st).get(c)
        }
        state = if (nxt != null) nxt.intValue() else 0
      }
      val o = outs(state)
      if (o.length != 0) {
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; total += 1L; j += 1 }
      }
      i += 1
    }
    val matched = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var k = 0
    while (k < sortedIdx.length) {
      if (counts(sortedIdx(k)) > 0L) matched += patternUtf8(sortedIdx(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, new GenericArrayData(matched.toArray)))
  }

  override protected def nullSafeEval(t: Any): Any =
    hits(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acPatterns", this, classOf[MultiPatternHits].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.hits($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternHits =
    copy(child = newChild)
}

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen'd expression — the mojibake-hygiene pass every multilingual
  * corpus needs before exact/near dedup: 'e'+U+0301 and precomposed 'é'
  * are different byte strings that render identically, so un-normalized
  * text defeats hash-based dedup and inflates vocabularies. Spark has no
  * builtin; this wraps `java.text.Normalizer` (the same UAX #15 algorithm
  * DuckDB's `nfc_normalize` implements, which is what makes the oracle
  * exact). ASCII fast path: a string whose byte count equals its char
  * count contains no combining sequences and is returned UNCHANGED
  * (zero-copy — on a mostly-ASCII corpus the expression is a length
  * compare per row). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc_normalize"

  def normalize(t: UTF8String): UTF8String = {
    if (t.numBytes() == t.numChars()) return t // pure ASCII is NFC already
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(t: Any): Any =
    normalize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.normalize($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object MultiPatternHits {
  /** Determinized automaton tables — see the `automaton` scaladoc. */
  final case class Automaton(
      delta: Array[Int], fail: Array[Int], outs: Array[Array[Int]],
      wide: Array[java.util.HashMap[Character, Integer]], anyWide: Boolean)
}

object TextExpressionFunctions {

  /** Distinct winnowed k-gram fingerprints of `text` in first-occurrence
    * order; null when shorter than `kgram` chars. */
  def winnowFingerprints(text: Column, kgram: Int, window: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), kgram, window))

  /** Lexicographically smallest md5 hex digest over every `window`-char
    * substring of `text`; null when shorter than `window` chars. */
  def minWindowMd5(text: Column, window: Int): Column =
    ColumnBridge.column(MinWindowMd5(ColumnBridge.expression(text), window))

  /** struct(total_hits, matched) of Aho-Corasick matches of `patterns`
    * in `text` — every start position counted, overlapping included. */
  def multiPatternHits(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternHits(ColumnBridge.expression(text), patterns))

  /** Unicode NFC canonical composition; ASCII rows pass through
    * zero-copy. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
