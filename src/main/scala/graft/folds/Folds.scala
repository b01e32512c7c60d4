package graft.folds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, StructType}

import graft.core.SchemaOps

/** A named aggregate column — the Spark-native form of the reference's
  * `FoldRecord` (a per-output-column fold living inside a record of folds,
  * reference `src/Frames/Folds.hs:93,98-103`). `expr` must be an aggregate
  * (or combination of aggregates) `Column`; `name` is the output column.
  *
  * Collecting a `Seq[NamedAgg]` into ONE `agg(...)` call is the engine's
  * single-pass multi-aggregation guarantee (≙ the applicative product
  * `sequenceRecFold`, reference `src/Frames/Folds.hs:149-154`): one shuffle,
  * one pass, partial aggregation on the map side.
  */
final case class NamedAgg(name: String, expr: Column) {
  def column: Column = expr.as(name)
}

/** The column-fold algebra (reference `Frames.Folds`,
  * `src/Frames/Folds.hs`) re-expressed as combinators over aggregate
  * `Column` expressions. Each fold is a Catalyst aggregate expression, so
  * Tungsten gives hash aggregation + whole-stage codegen + map-side partial
  * aggregation for free — the properties the reference encodes via `Fold`'s
  * step/extract and monoid merge contracts.
  */
object Folds {

  /** ≙ `toFoldRecord` (reference `src/Frames/Folds.hs:98-103`): name an
    * aggregate expression as an output column. */
  def toFoldRecord(name: String, expr: Column): NamedAgg = NamedAgg(name, expr)

  /** ≙ `recFieldF` (reference `src/Frames/Folds.hs:106-113`): aggregate a
    * DERIVED expression into a named output — e.g.
    * `recFieldF("sumXY", sum, col("x") * col("y"))`. */
  def recFieldF(name: String, agg: Column => Column, derived: Column): NamedAgg =
    NamedAgg(name, agg(derived))

  /** ≙ `fieldToFieldFold` (reference `src/Frames/Folds.hs:117-123`):
    * aggregate input column `from` into output column `to`. */
  def fieldToFieldFold(from: String, to: String, agg: Column => Column): NamedAgg =
    NamedAgg(to, agg(col(from)))

  /** ≙ `sequenceRecFold` (reference `src/Frames/Folds.hs:149-154`) — the
    * record-of-folds → fold-of-records applicative product. In Spark the
    * product is simply "all aggregates in one `agg` call"; this returns the
    * column list for that call. */
  def sequenceRecFold(aggs: Seq[NamedAgg]): Seq[Column] = aggs.map(_.column)

  /** ≙ `foldAll` (reference `src/Frames/Folds.hs:198-206`): apply one
    * unconstrained endo-fold (same output type as input — min/max/first/last)
    * to EVERY column of `schema` except `exclude`, keeping names. */
  def foldAll(schema: StructType, agg: Column => Column, exclude: Seq[String] = Nil): Seq[NamedAgg] = {
    val drop = exclude.toSet
    schema.fieldNames.toSeq.filterNot(drop).map(n => NamedAgg(n, agg(col(n))))
  }

  /** ≙ `foldAllConstrained @c` (reference `src/Frames/Folds.hs:219-225`):
    * apply an endo-fold to every column whose `DataType` satisfies the
    * predicate — schema-generic aggregation, runtime-schema-driven instead of
    * type-level induction. */
  def foldAllConstrained(
      schema: StructType,
      agg: Column => Column,
      keep: DataType => Boolean,
      exclude: Seq[String] = Nil): Seq[NamedAgg] = {
    val drop = exclude.toSet
    schema.fields.toSeq
      .filter(f => !drop(f.name) && keep(f.dataType))
      .map(f => NamedAgg(f.name, agg(col(f.name))))
  }

  /** The `@Num` instantiation the reference example uses
    * (`examples/AddRowsByLabel.hs:51,104`): the fold applied to every
    * numeric column. */
  def foldAllNumeric(schema: StructType, agg: Column => Column, exclude: Seq[String] = Nil): Seq[NamedAgg] =
    foldAllConstrained(schema, agg, _.isInstanceOf[NumericType], exclude)

  /** ≙ `mergeDataFolds` (reference `src/Frames/Aggregation.hs:169-173`):
    * combine single-column folds into a multi-column fold. Trivial in the
    * Seq representation; kept for API parity. */
  def mergeDataFolds(folds: NamedAgg*): Seq[NamedAgg] = folds.toSeq

  /** Convenience: run a multi-aggregate over a whole DataFrame with no
    * grouping (global aggregate — a one-group fold). */
  def foldFrame(df: DataFrame, aggs: Seq[NamedAgg]): DataFrame = {
    require(aggs.nonEmpty, "foldFrame: need at least one aggregate")
    df.agg(aggs.head.column, aggs.tail.map(_.column): _*)
  }

  /** Eagerly validate that the columns a fold references exist — plan-build
    * failure instead of analysis-time `AnalysisException` (SURVEY §7.4). */
  def validate(schema: StructType, referenced: Seq[String], ctx: String): Unit =
    SchemaOps.requireSubset(schema, referenced, ctx)
}
