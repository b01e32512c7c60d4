package graft.core

/** Code-point string order — identical to Spark's default UTF8_BINARY
  * collation (byte-wise UTF-8 comparison preserves code-point order) and
  * to DuckDB's default VARCHAR comparison, i.e. the order BOTH engines
  * use for `ORDER BY` on strings.
  *
  * Scala/Java `String` ordering compares UTF-16 code UNITS instead:
  * supplementary characters (surrogates 0xD800–0xDFFF) sort BELOW
  * U+E000..U+FFFF, so the two orders disagree the moment astral text
  * (emoji, rare CJK, math alphanumerics) meets a tie. Any DRIVER-side
  * sort or tie-break whose result is part of a cross-engine output
  * contract — tokenizer merge/piece selection cuts, sketch top-N
  * boundaries, matched-pattern lists — must use THIS ordering, or the
  * Spark face silently diverges from the oracle on non-BMP input (the
  * Bpe/UnigramLm round-7 lesson, generalized).
  */
object Utf8Order {

  def compare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  val ordering: Ordering[String] = (a: String, b: String) => compare(a, b)
}
