package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical backward as-of join: both sides hash-partitioned on the equi-keys
  * (Catalyst inserts the exchanges from `requiredChildDistribution`) and
  * sorted by (keys, time) (from `requiredChildOrdering`), then merged with a
  * single forward pass per partition — O(|L|+|R|), O(1) state (one buffered
  * match row), no per-key buffering. This is the plan that survives 100 TB:
  * no broadcast of the right side, no windowed union materializing both
  * inputs, and AQE can still coalesce both shuffles consistently because
  * they sit under one stage boundary like a sort-merge join's.
  *
  * Null semantics match SQL joins: null keys or null times never match.
  * Right rows with null key/time are skipped; left rows with null key/time
  * emit null-padded output.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    toleranceMicros: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tol = toleranceMicros

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, leftOut)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightOut.size)
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTime: Long = 0L
        // Best match so far: copies, because projections reuse their buffers.
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTime: Long = 0L

        private def advanceRight(): Unit = {
          var ok = false
          while (!ok && rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead)
            if (!rHeadKey.anyNull) {
              val t = rTimeBound.eval(rHead)
              if (t != null) { rHeadTime = t.asInstanceOf[Long]; ok = true }
            }
          }
          if (!ok) { rHead = null; rHeadKey = null }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeV = lTimeBound.eval(l)
          numOutputRows += 1
          if (lKey.anyNull || lTimeV == null) return joined(l, nullRight)
          val lt = lTimeV.asInstanceOf[Long]
          // Advance the right cursor to the last row with key == lKey and
          // time <= lt; rows for smaller keys are drained, the first row
          // beyond (key, lt) stays buffered for the next left row.
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) {
              advanceRight(); continue = rHead != null
            } else if (c == 0 && rHeadTime <= lt) {
              matchRow = rHead.copy(); matchKey = rHeadKey.copy(); matchTime = rHeadTime
              advanceRight(); continue = rHead != null
            } else continue = false
          }
          val hit = matchRow != null && keyOrd.compare(matchKey, lKey) == 0 &&
            tol.forall(t => lt - matchTime <= t)
          if (hit) { numMatched += 1; joined(l, matchRow) }
          else joined(l, nullRight)
        }
      }
    }
  }
}
