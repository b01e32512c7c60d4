package graft.mapreduce

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Typed entry points (SURVEY §7.4): the reference's value proposition is
  * compile-time schema safety; `Dataset[T]` with case classes is the Scala
  * equivalent. This facade is the fully general Unpack/Assign/Reduce in
  * the type system — arbitrary Scala in every stage, checked at compile
  * time — and the untyped [[MapReduce]] is the Catalyst-optimizable fast
  * path. Use the untyped path when the stages are expressible as
  * `Column`s (pushdown + codegen); use this one when they are not.
  */
object TypedMapReduce {

  /** ≙ `mapReduceFold unpack assign reduce` (reference `Readme.md:117`)
    * in its full generality: unpack: row → 0..n rows (filter/flatMap),
    * assign: row → (key, data), reduce: (key, data iterator) → 0..n
    * results. Compiles to `flatMap → groupByKey → flatMapGroups` — the
    * grouped rows shuffle, as in any arbitrary-function reduce. */
  def mapReduce[T, K: Encoder, D, O: Encoder](ds: Dataset[T])(
      unpack: T => IterableOnce[T],
      assign: T => (K, D),
      reduce: (K, Iterator[D]) => IterableOnce[O])(
      implicit kvEnc: Encoder[(K, D)], tEnc: Encoder[T]): Dataset[O] =
    ds.flatMap(unpack)
      .map(assign)
      .groupByKey(_._1)
      .flatMapGroups((k: K, rows: Iterator[(K, D)]) => reduce(k, rows.map(_._2)))

  /** ≙ `foldAndAddKey` with an arbitrary typed fold (reference
    * `src/Frames/MapReduce.hs:162-167`): the fold is an
    * `Aggregator[T,B,O]`, so partial aggregation (map-side combine)
    * applies — this is the typed path that does NOT shuffle raw rows. */
  def foldAndAddKey[T, K: Encoder, B, O, R: Encoder](ds: Dataset[T])(
      key: T => K,
      fold: Aggregator[T, B, O],
      attachKey: (K, O) => R): Dataset[R] =
    ds.groupByKey(key)
      .agg(fold.toColumn)
      .map { case (k, o) => attachKey(k, o) }(implicitly[Encoder[R]])
}
