package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key across two versions of a
  * table as added / removed / changed / unchanged, with per-column
  * change flags — the data-diff behind pipeline regression checks and
  * migration sign-offs ("same rows in, what changed coming out?").
  *
  * One full outer join on the key — NULL-SAFE (`<=>`) on every key
  * column, with explicit presence markers, so rows whose key contains
  * nulls still pair up and absence is never inferred from key
  * nullability. Column comparison is null-safe too: null→value and
  * value→null transitions count as changes, null→null does not. The
  * summary face aggregates to one row per status — at 100 TB you look
  * at counts first and fetch example keys second (the `detail` face
  * filtered by status), never the full diff at once. */
object Reconcile {

  /** Per-key diff: (keys..., status, changed_cols). `changed_cols` is
    * the sorted list of value columns whose null-safe comparison failed
    * (empty for added/removed/unchanged). */
  def detail(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "Reconcile: need at least one key column")
    require(before.columns.toSet == after.columns.toSet,
      s"Reconcile: schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valueCols = before.columns.toSeq.diff(keyCols).sorted
    val b = before.select(before.columns.toSeq.map(c => col(c).as(s"b_$c"))
      :+ lit(true).as("__in_b"): _*)
    val a = after.select(after.columns.toSeq.map(c => col(c).as(s"a_$c"))
      :+ lit(true).as("__in_a"): _*)
    // <=> on the keys: a null key component still matches itself, so a
    // row keyed (1, null) present in both versions joins instead of
    // surfacing as a spurious added+removed pair
    val joinCond = keyCols.map(k => b(s"b_$k") <=> a(s"a_$k")).reduce(_ && _)
    val joined = b.join(a, joinCond, "full_outer")
    // presence comes from the markers, never from key nullability
    val inB = col("__in_b").isNotNull
    val inA = col("__in_a").isNotNull
    val changed = array_sort(filter(
      array(valueCols.map(c =>
        when(!(col(s"b_$c") <=> col(s"a_$c")), lit(c))): _*),
      x => x.isNotNull))
    joined.select(
      keyCols.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) ++ Seq(
        when(!inB, "added").when(!inA, "removed")
          .when(size(changed) > 0, "changed").otherwise("unchanged").as("status"),
        when(inB && inA, changed).otherwise(array().cast("array<string>"))
          .as("changed_cols")): _*)
  }

  /** Aggregate face: one row per status with count and example keys.
    * Examples come through the bounded [[graft.folds.Aggregators.bottomK]]
    * buffer — ≤ nExamples keys per status per partition cross the
    * shuffle (a collect_list would drag EVERY key of the dominant
    * 'unchanged' status onto one executor). Keys are rendered as strings
    * (lexically smallest kept) so the face works for any key type. */
  def summary(
      before: DataFrame, after: DataFrame, keyCols: Seq[String],
      nExamples: Int = 3): DataFrame = {
    val pick = graft.folds.Aggregators.asColumn(
      graft.folds.Aggregators.bottomK[String](nExamples),
      col(keyCols.head).cast("string"))(
      org.apache.spark.sql.Encoders.STRING)
    detail(before, after, keyCols)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), pick.as("example_keys"))
  }
}
