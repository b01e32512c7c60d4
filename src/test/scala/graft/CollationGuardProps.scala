package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.core.Utf8Order

/** The registered-collation guard: SURVEY §8.2's collation row promises
  * every driver-side contract-bearing string tie uses code-point order
  * (= Spark UTF8_BINARY = DuckDB ORDER BY). These properties enforce it
  * against an INDEPENDENT reimplementation — unsigned byte-wise UTF-8
  * comparison — on randomized astral-heavy inputs, for each registered
  * surface: the shared comparator itself, Space-Saving's eviction /
  * merge / top-N-boundary ties, and Aho–Corasick's matched-pattern
  * emission order. A UTF-16 comparator slipping into any of these (the
  * round-7 BPE bug class) fails here on random data, no hand-engineered
  * corpus needed: the alphabet mixes ASCII, 2-byte, private-use BMP
  * (U+E000, U+FFFD) and astral symbols, exactly the regime where UTF-16
  * code-unit order and UTF-8 byte order disagree. */
object CollationGuardProps extends Properties("CollationGuard") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  /** Independent contract implementation: unsigned lexicographic order of
    * the UTF-8 encodings (the definition of UTF8_BINARY). Deliberately
    * NOT built on Utf8Order — byte-wise, not code-point-wise. */
  private def utf8ByteCompare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    Integer.compare(x.length, y.length)
  }
  private val byteOrd: Ordering[String] = (a: String, b: String) => utf8ByteCompare(a, b)

  // UTF-16 order puts surrogates (astral chars) BELOW U+E000/U+FFFD;
  // UTF-8/code-point order puts them above — every tie among these mixes
  // distinguishes the two collations
  private val smile = new String(Character.toChars(0x1F600))
  private val rocket = new String(Character.toChars(0x1F680))
  private val dsx = new String(Character.toChars(0x1D54F))
  private val symbols = Seq("a", "z", "é", "", "�", smile, rocket, dsx)

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf(symbols))
  } yield cs.mkString

  private def cps(s: String): Seq[Int] = s.codePoints().toArray.toSeq

  property("Utf8Order == byte-wise UTF-8 order (the collation law itself)") =
    Prop.forAll(wordGen, wordGen) { (a, b) =>
      if (!wellFormed(Seq(a, b))) Prop.passed
      else {
      val got = Integer.signum(Utf8Order.compare(a, b))
      val want = Integer.signum(utf8ByteCompare(a, b))
      Prop(got == want) :| s"a=${cps(a)} b=${cps(b)} got=$got want=$want"
      }
    }

  // ------------------------------------------------------------ SpaceSaving
  // Reference reimplementation of the sketch with the independent
  // comparator at every tie surface (eviction, merge trim, final top-N).
  private type E = (String, Long, Long)
  private def refReduce(b: Vector[E], a: String, capacity: Int): Vector[E] = {
    val i = b.indexWhere(_._1 == a)
    if (i >= 0) b.updated(i, (a, b(i)._2 + 1, b(i)._3))
    else if (b.size < capacity) b :+ ((a, 1L, 0L))
    else {
      val victim = b.minBy(e => (e._2, e._1))(
        Ordering.Tuple2(Ordering.Long, byteOrd.reverse))
      b.updated(b.indexOf(victim), (a, victim._2 + 1L, victim._2))
    }
  }
  private def refSort(b: Vector[E]): Vector[E] =
    b.sortBy(e => (-e._2, e._1))(Ordering.Tuple2(Ordering.Long, byteOrd))
  private def refMerge(x: Vector[E], y: Vector[E], capacity: Int): Vector[E] = {
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val mx = if (x.size < capacity) 0L else x.map(_._2).min
      val my = if (y.size < capacity) 0L else y.map(_._2).min
      val xm = x.map(e => e._1 -> e).toMap
      val ym = y.map(e => e._1 -> e).toMap
      refSort((xm.keySet ++ ym.keySet).toVector.map { k =>
        val (cx, ex) = xm.get(k).map(e => (e._2, e._3)).getOrElse((mx, mx))
        val (cy, ey) = ym.get(k).map(e => (e._2, e._3)).getOrElse((my, my))
        (k, cx + cy, ex + ey)
      }).take(capacity)
    }
  }

  // short words (1-2 SYMBOLS, never UTF-16-truncated — a .take(k) on the
  // string would split surrogate pairs and manufacture ill-formed input
  // the contract excludes) so count ties are frequent
  private val shortWordGen: Gen[String] = for {
    n <- Gen.choose(1, 2)
    cs <- Gen.listOfN(n, Gen.oneOf(symbols))
  } yield cs.mkString
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(4, 24)
    ws <- Gen.listOfN(n, shortWordGen)
  } yield ws

  /** Contract scope guard: UTF8_BINARY equivalence is only defined for
    * well-formed UTF-16 (parquet/UTF-8 sources cannot produce unpaired
    * surrogates; Java's UTF-8 encoder maps them to '?'). ScalaCheck
    * SHRINKING can still split a surrogate pair mid-string — treat those
    * shrunk candidates as vacuously passing instead of reporting a
    * divergence outside the contract. */
  private def wellFormed(ss: Iterable[String]): Boolean =
    ss.forall(s => s.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF))

  property("Space-Saving eviction/merge/top-N ties follow the shared collation") =
    Prop.forAll(streamGen, Gen.choose(2, 6), Gen.choose(1, 10)) { (stream, capacity0, split) =>
      if (!wellFormed(stream) || capacity0 < 1) Prop.passed
      else {
      val capacity = math.max(2, capacity0)
      val topN = 1 + math.floorMod(split - 1, capacity)
      val agg = graft.folds.Aggregators.spaceSaving(capacity, topN)
      // single-buffer path: every eviction tie goes through the comparator
      val b1 = stream.foldLeft(agg.zero)(agg.reduce)
      val r1 = refSort(stream.foldLeft(Vector.empty[E])(refReduce(_, _, capacity))).take(topN)
      val g1 = agg.finish(b1)
      // merge path: split the stream, sketch each half, merge — the trim
      // and final sort both cut on collation ties
      val (sa, sb) = stream.splitAt(stream.size / 2)
      val g2 = agg.finish(agg.merge(
        sa.foldLeft(agg.zero)(agg.reduce), sb.foldLeft(agg.zero)(agg.reduce)))
      val r2 = refSort(refMerge(
        sa.foldLeft(Vector.empty[E])(refReduce(_, _, capacity)),
        sb.foldLeft(Vector.empty[E])(refReduce(_, _, capacity)), capacity)).take(topN)
      (Prop(g1 == r1) :| s"reduce path: got=$g1 want=$r1 stream=${stream.map(cps)}") &&
        (Prop(g2 == r2) :| s"merge path: got=$g2 want=$r2 stream=${stream.map(cps)}")
      }
    }

  // --------------------------------------------------------- Aho–Corasick
  private val patternSetGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 6)
    ps <- Gen.listOfN(n, wordGen)
  } yield ps.distinct

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    ws <- Gen.listOfN(n, Gen.oneOf(wordGen, Gen.oneOf(" ", "x", "")))
  } yield ws.mkString

  property("Aho–Corasick matched-pattern emission is collation-ordered and complete") =
    Prop.forAll(patternSetGen, textGen) { (patterns, text) =>
      if (!wellFormed(patterns :+ text) || patterns.isEmpty || patterns.exists(_.isEmpty))
        Prop.passed
      else {
      val row = Seq(Tuple1(text)).toDF("t")
        .select(graft.functions.TextExpressionFunctions
          .multiPatternHits(org.apache.spark.sql.functions.col("t"), patterns).as("h"))
        .select("h.total_hits", "h.matched")
        .collect().head
      val got = row.getSeq[String](1).toList
      // brute force: which patterns occur as substrings, how many times
      def occurrences(p: String): Int =
        if (p.isEmpty) 0
        else Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
          .takeWhile(_ >= 0).size
      val occ = patterns.map(p => p -> occurrences(p)).toMap
      val want = patterns.filter(occ(_) > 0).sorted(byteOrd)
      val wantTotal = occ.values.map(_.toLong).sum
      (Prop(got == want) :|
        s"matched order: got=${got.map(cps)} want=${want.map(cps)} text=${cps(text)}") &&
        (Prop(row.getLong(0) == wantTotal) :| s"total: got=${row.getLong(0)} want=$wantTotal")
      }
    }
}
