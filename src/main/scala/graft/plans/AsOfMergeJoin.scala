package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension tier ((c) in the build brief): a custom
  * logical node + planner strategy + physical operator for the backward
  * as-of join, planned through `GraftExtensions.injectPlannerStrategy`.
  *
  * graft's composed as-of join (`operators.AsOfJoin.backward`, the
  * reference-free operator behind x2) is already single-shuffle: union
  * both sides padded to a common schema, one window pass carries the
  * latest right payload forward. The physical form here removes the two
  * structural costs that padding imposes at 100 TB:
  *
  *   - **shuffle width**: the union shuffles every row at the combined
  *     width (left columns + right payload + nulls for the other side's
  *     slots). Here each side shuffles only its own columns.
  *   - **window buffering**: the window operator materializes each key's
  *     partition slice; the merge below streams both sorted sides with
  *     O(1) state (current right head + current candidate).
  *
  * Semantics are pinned to the composed face by differential property
  * tests (AsOfMergeProps): right rows with a null key never match; a
  * null time sorts as -infinity on both sides (Spark's ascending
  * nulls-first), so a null-time right row is "state since forever" and a
  * null-time left row can only see null-time right rows; at equal
  * (key, time) the LAST right row in tie-break order wins and the match
  * is inclusive (right-at-equal-time visible to the left row).
  *
  * Scale shape: ClusteredDistribution on each side's key — Catalyst's
  * EnsureRequirements co-partitions the two shuffles (AQE may coalesce
  * both consistently, exactly as for SortMergeJoin) — plus per-partition
  * (key, time) sorts; the merge itself is a single linear pass per
  * partition. Skewed keys take the same mitigations as any shuffled
  * join (salting upstream; AQE skew handling does not split custom
  * nodes, documented in AsOfJoin.backwardMerge's scaladoc). Catalyst's
  * generic ColumnPruning prunes the node's children to key/time/tie +
  * consumed payload (the node's expressions ARE its references), so
  * narrow projections still reach the scans — spec-pinned.
  *
  * Measured honestly (payload consumed — count() alone lets Catalyst
  * prune the COMPOSED face's whole window to a scan-count, which is the
  * artifact behind the round-9 "7x slower" reading): this face matches
  * or beats the composed one in every probed regime, up to 2x on a
  * narrow left (SCALE.md round-10 asof probe).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightTies: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[SortMergeAsOfJoinExec]]. Injected by
  * [[GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, ties) =>
      SortMergeAsOfJoinExec(lk, lt, rk, rt, ties, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join: children are hash-clustered on their
  * keys and sorted by (key, time[, ties]); each partition pair is merged
  * in one streaming pass. For every left row the operator attaches the
  * last right row (in (time, ties) order) with an equal key and
  * time <= left time, or nulls. Output = left columns ++ right columns
  * (right nullable). */
case class SortMergeAsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightTies: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of merge: key types differ (${leftKey.dataType} vs ${rightKey.dataType})")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of merge: time types differ (${leftTime.dataType} vs ${rightTime.dataType})")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTies.map(SortOrder(_, Ascending)))

  // Left rows pass through 1:1 in their sorted order, so the left
  // child's partitioning and the required (key, time) ordering survive.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val lt = leftTime
    val rk = rightKey; val rt = rightTime
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Separate projections per column so their reusable result buffers
      // never alias each other within one loop iteration.
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      // Row-level natural ascending (nulls-first) comparisons over the
      // single-field key/time rows: nulls-first IS the -infinity
      // semantics the composed face gets from its window sort.
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))

      // One-row lookahead over the right side, null-key rows skipped
      // (SQL join semantics: null keys never match). Rows and their
      // projected keys/times are copied out of the iterator's reusable
      // buffers before being buffered.
      var rHeadRow: InternalRow = null
      var rHeadKey: InternalRow = null
      var rHeadTime: InternalRow = null
      def advanceRight(): Unit = {
        rHeadRow = null
        while (rHeadRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          if (!k.isNullAt(0)) {
            rHeadRow = r.copy()
            rHeadKey = k.copy()
            rHeadTime = rTimeProj(r).copy()
          }
        }
      }
      advanceRight()

      // Current candidate: the last consumed right row whose key may
      // still equal an upcoming left key. Because both sides arrive in
      // (key, time) order, the candidate only ever advances.
      var cand: InternalRow = null
      var candKey: InternalRow = null

      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      lIter.map { l =>
        val lKey = lKeyProj(l)
        if (lKey.isNullAt(0)) {
          joined(l, nullRight)
        } else {
          val lTime = lTimeProj(l)
          var scanning = true
          while (scanning && rHeadRow != null) {
            val kc = keyOrd.compare(rHeadKey, lKey)
            if (kc < 0) advanceRight()
            else if (kc == 0 && timeOrd.compare(rHeadTime, lTime) <= 0) {
              cand = rHeadRow; candKey = rHeadKey
              advanceRight()
            } else scanning = false
          }
          if (cand != null && keyOrd.compare(candKey, lKey) == 0) joined(l, cand)
          else joined(l, nullRight)
        }
      }
    }
  }
}
