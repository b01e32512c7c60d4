package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{NumericType, StructType}

/** Runtime schema utilities — the stand-ins for the reference's compile-time
  * record proofs (`ks F.⊆ rs` subset proof, `F.RDeleteAll ks rs` complement,
  * `F.Disjoint` — see reference `src/Frames/MapReduce.hs:122,138` and
  * `src/Frames/Aggregation.hs:65`). The reference checks these with GHC's
  * type checker; on Spark the schema is runtime data, so we validate eagerly
  * at plan-build time (fail fast with a clear message, before any action).
  */
object SchemaOps {

  /** ≙ the `ks ⊆ rs` constraint: every requested column must exist. */
  def requireSubset(schema: StructType, cols: Seq[String], ctx: String): Unit = {
    val have = schema.fieldNames.toSet
    val missing = cols.filterNot(have)
    require(
      missing.isEmpty,
      s"$ctx: column(s) ${missing.mkString(", ")} not in schema [${schema.fieldNames.mkString(", ")}]")
  }

  /** ≙ `F.RDeleteAll ks rs`: schema columns minus `cols`, in schema order. */
  def complement(schema: StructType, cols: Seq[String]): Seq[String] = {
    val drop = cols.toSet
    schema.fieldNames.toSeq.filterNot(drop)
  }

  /** ≙ the `F.Disjoint a b ~ 'True` constraint (reference
    * `src/Frames/Aggregation.hs:65`). */
  def requireDisjoint(a: Seq[String], b: Seq[String], ctx: String): Unit = {
    val overlap = a.toSet.intersect(b.toSet)
    require(overlap.isEmpty, s"$ctx: column sets overlap on ${overlap.mkString(", ")}")
  }

  /** Columns whose type satisfies the "numeric" constraint — the runtime
    * analog of the reference's `foldAllConstrained @Num`
    * (`src/Frames/Folds.hs:219-225`). */
  def numericCols(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }

  def numericCols(df: DataFrame): Seq[String] = numericCols(df.schema)
}
