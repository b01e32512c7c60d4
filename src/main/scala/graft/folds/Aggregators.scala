package graft.folds

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The typed-fold escape hatch: the reference accepts ANY
  * `Control.Foldl.Fold x b` as a per-group aggregation
  * (`foldAndAddKey`, reference `src/Frames/MapReduce.hs:162-167`), and
  * derives folds from monoids (`foldAllMonoid` / `monoidWrapperToFold`,
  * reference `src/Frames/Folds.hs:230-249`). Spark's mergeable-buffer
  * contract for distributed aggregation is `Aggregator[IN, BUF, OUT]` —
  * `zero`/`reduce`/`merge` are exactly the monoid laws the reference relies
  * on, which is what makes these folds correct under partial aggregation
  * (map-side combine) and, later, streaming state merges.
  */
object Aggregators {

  /** A fold in the reference's step/extract shape
    * (`Control.Foldl.Fold`): initial state, step, merge, extract.
    * `merge` is required (the reference gets it for free only for monoid
    * folds; on a cluster every fold must merge partial states). */
  def fold[IN, BUF, OUT](
      zeroV: BUF,
      step: (BUF, IN) => BUF,
      mergeV: (BUF, BUF) => BUF,
      extract: BUF => OUT)(
      implicit bufEnc: Encoder[BUF], outEnc: Encoder[OUT]): Aggregator[IN, BUF, OUT] =
    new Aggregator[IN, BUF, OUT] {
      def zero: BUF = zeroV
      def reduce(b: BUF, a: IN): BUF = step(b, a)
      def merge(a: BUF, b: BUF): BUF = mergeV(a, b)
      def finish(b: BUF): OUT = extract(b)
      def bufferEncoder: Encoder[BUF] = bufEnc
      def outputEncoder: Encoder[OUT] = outEnc
    }

  /** ≙ `monoidWrapperToFold` (reference `src/Frames/Folds.hs:230-233`):
    * an aggregator from (mempty, <>). */
  def monoidFold[A](empty: A, combine: (A, A) => A)(
      implicit enc: Encoder[A]): Aggregator[A, A, A] =
    fold[A, A, A](empty, combine, combine, identity)(enc, enc)

  /** Null-skipping wrapper ≙ `filteredFold` (reference
    * `src/Frames/Folds/General.hs:110-112`): lift a fold over `A` to a fold
    * over nullable `A` that ignores nulls — the semantics Spark built-in
    * aggregates already have; this exists for custom folds. */
  def skipNulls[A >: Null, BUF, OUT](agg: Aggregator[A, BUF, OUT]): Aggregator[A, BUF, OUT] =
    new Aggregator[A, BUF, OUT] {
      def zero: BUF = agg.zero
      def reduce(b: BUF, a: A): BUF = if (a == null) b else agg.reduce(b, a)
      def merge(a: BUF, b: BUF): BUF = agg.merge(a, b)
      def finish(b: BUF): OUT = agg.finish(b)
      def bufferEncoder: Encoder[BUF] = agg.bufferEncoder
      def outputEncoder: Encoder[OUT] = agg.outputEncoder
    }

  /** Null-poisoning sum — the canonical NON-default null semantics the
    * reference supports via `functorFoldAllConstrained`
    * (`src/Frames/Folds/General.hs:260-273`): any null in the group makes
    * the result null. Demonstrates user-controlled null behavior inside the
    * fold (Spark's built-ins can't express this directly). */
  def nullPoisoningSum: Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] =
    new Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
      def zero: (Double, Boolean) = (0.0, false)
      def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
        if (a == null) (b._1, true) else (b._1 + a, b._2)
      def merge(a: (Double, Boolean), b: (Double, Boolean)): (Double, Boolean) =
        (a._1 + b._1, a._2 || b._2)
      def finish(b: (Double, Boolean)): java.lang.Double =
        if (b._2) null else java.lang.Double.valueOf(b._1)
      def bufferEncoder: Encoder[(Double, Boolean)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Weighted mean sum(x*y)/sum(y) as a typed fold — the reference example's
    * flagship composed fold (`examples/AddRowsByLabel.hs:61-69`). Also
    * expressible natively as `sum(x*y)/sum(y)`; tests assert both agree
    * (SURVEY §7.2). IN = (x, weight). */
  def weightedMean: Aggregator[(Double, Double), (Double, Double), Double] =
    new Aggregator[(Double, Double), (Double, Double), Double] {
      def zero: (Double, Double) = (0.0, 0.0)
      def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
        (b._1 + a._1 * a._2, b._2 + a._2)
      def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Double)): Double = if (b._2 == 0.0) Double.NaN else b._1 / b._2
      def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Bounded per-group top-k as a mergeable fold: the buffer holds at most
    * k (score, id) pairs, so map-side partial aggregation ships at most k
    * entries per group per partition through the shuffle — the scale
    * alternative to the window `row_number` pattern, which shuffles and
    * sorts EVERY row of every group. Bounded mergeable state also makes it
    * streaming-legal. Largest score first; ties break toward the smaller
    * id (deterministic). */
  def topK(k: Int): Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] = {
    require(k >= 1, "topK: k must be >= 1")
    new Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
      private def key(e: (Double, Long)): (Double, Long) = (-e._1, e._2)
      private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
        s.sortBy(key).take(k)
      def zero: Seq[(Double, Long)] = Nil
      def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
        if (b.size >= k && Ordering[(Double, Long)].gteq(key(a), key(b.last))) b
        else trim(b :+ a)
      def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
        trim(a ++ b)
      def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
      def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    }
  }

  /** Generalization of [[topK]] to ANY element type with ANY ordering: a
    * bounded mergeable buffer holding the `k` smallest elements. Ships at
    * most k elements per group per partition through the shuffle — the
    * scale-correct replacement for the window `row_number` pattern wherever
    * the per-group selection key isn't a (Double, Long) score (e.g.
    * deterministic stratified sampling ordered by a content-hash string).
    * Smallest-first under `ord`; pass a reversed ordering for largest. */
  def bottomK[A](k: Int)(
      implicit ord: Ordering[A],
      tag: scala.reflect.runtime.universe.TypeTag[Seq[A]]): Aggregator[A, Seq[A], Seq[A]] = {
    require(k >= 1, "bottomK: k must be >= 1")
    val enc: Encoder[Seq[A]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[A]]()
    new Aggregator[A, Seq[A], Seq[A]] {
      private def trim(s: Seq[A]): Seq[A] = s.sorted(ord).take(k)
      def zero: Seq[A] = Nil
      def reduce(b: Seq[A], a: A): Seq[A] =
        if (b.size >= k && ord.gteq(a, b.last)) b else trim(b :+ a)
      def merge(a: Seq[A], b: Seq[A]): Seq[A] = trim(a ++ b)
      def finish(b: Seq[A]): Seq[A] = b
      def bufferEncoder: Encoder[Seq[A]] = enc
      def outputEncoder: Encoder[Seq[A]] = enc
    }
  }

  /** Space-Saving heavy hitters (Metwally et al. 2005) as a mergeable
    * bounded fold — the one-pass scale path for top-k frequent items: an
    * exact top-k over 100 TB of tokens must shuffle every (group, token)
    * pair, while this ships at most `capacity` (item, count, err) entries
    * per group per partition. Merge is the Misra-Gries/Space-Saving
    * summary merge (Agarwal et al., "Mergeable Summaries"): keys absent
    * from a full sketch contribute that sketch's minimum count, then the
    * union is trimmed back to `capacity` by count.
    *
    * Guarantees: `count` overestimates the true frequency by at most
    * `err` (count − err ≤ true ≤ count), any item with true frequency
    * > n/capacity is present, and — the property the oracle checks —
    * when `capacity` ≥ the group's distinct-item count nothing is ever
    * evicted, so every count is EXACT and every err is 0.
    *
    * Output: the `topN` entries by (count desc, item asc in CODE-POINT
    * order — the engines' shared ORDER BY collation). */
  def spaceSaving(capacity: Int, topN: Int): Aggregator[
      String, Seq[(String, Long, Long)], Seq[(String, Long, Long)]] = {
    require(capacity >= 1 && topN >= 1 && topN <= capacity,
      "spaceSaving: need 1 <= topN <= capacity")
    type E = (String, Long, Long)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
    new Aggregator[String, Seq[E], Seq[E]] {
      def zero: Seq[E] = Vector.empty
      def reduce(b: Seq[E], a: String): Seq[E] = {
        val i = b.indexWhere(_._1 == a)
        if (i >= 0) b.updated(i, (a, b(i)._2 + 1, b(i)._3))
        else if (b.size < capacity) b :+ ((a, 1L, 0L))
        else {
          // evict the minimum-count entry (ties: largest item string in
          // CODE-POINT order — deterministic, and the same collation the
          // oracle's ORDER BY uses); the newcomer inherits its count as
          // error
          var mi = 0
          var m = b.head
          var j = 1
          while (j < b.size) {
            val e = b(j)
            if (e._2 < m._2 || (e._2 == m._2 &&
                graft.core.Utf8Order.compare(e._1, m._1) > 0)) { m = e; mi = j }
            j += 1
          }
          b.updated(mi, (a, m._2 + 1L, m._2))
        }
      }
      def merge(x: Seq[E], y: Seq[E]): Seq[E] = {
        if (x.isEmpty) y
        else if (y.isEmpty) x
        else {
          val mx = if (x.size < capacity) 0L else x.iterator.map(_._2).min
          val my = if (y.size < capacity) 0L else y.iterator.map(_._2).min
          val xm = x.iterator.map(e => e._1 -> e).toMap
          val ym = y.iterator.map(e => e._1 -> e).toMap
          val merged = (xm.keySet ++ ym.keySet).iterator.map { k =>
            val (cx, ex) = xm.get(k).map(e => (e._2, e._3)).getOrElse((mx, mx))
            val (cy, ey) = ym.get(k).map(e => (e._2, e._3)).getOrElse((my, my))
            (k, cx + cy, ex + ey)
          }.toVector
          merged.sortBy(e => (-e._2, e._1))(
            Ordering.Tuple2(Ordering.Long, graft.core.Utf8Order.ordering)).take(capacity)
        }
      }
      def finish(b: Seq[E]): Seq[E] = b.sortBy(e => (-e._2, e._1))(
        Ordering.Tuple2(Ordering.Long, graft.core.Utf8Order.ordering)).take(topN)
      def bufferEncoder: Encoder[Seq[E]] = enc
      def outputEncoder: Encoder[Seq[E]] = enc
    }
  }

  /** Register a typed aggregator as an untyped DataFrame aggregate column —
    * the bridge that lets custom folds participate in the single-pass
    * multi-aggregate `agg(...)` alongside built-ins. */
  def asColumn[IN, BUF, OUT](agg: Aggregator[IN, BUF, OUT], inputs: Column*)(
      implicit inEnc: Encoder[IN]): Column =
    udaf(agg, inEnc).apply(inputs: _*)
}
