package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Broadcast backward as-of join: when the right (reference) side is small —
  * a station catalog, a calibration table, a rate feed — shuffling and
  * sorting the 100 TB left side on the join key is pure waste. This variant
  * broadcasts the right side whole, builds one sorted index per key
  * (per partition, off the broadcast array), and answers each left row with
  * a binary search. The left side keeps its existing partitioning — zero
  * exchanges on the big side, same semantics as [[AsOfJoinExec]].
  *
  * Chosen by [[AsOfJoinStrategy]] on the same cost rule Spark uses for its
  * own joins: right-side plan stats under the autoBroadcastJoinThreshold.
  */
case class BroadcastAsOfJoinExec(
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
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tiebreak = rightTiebreak
    val tol = toleranceMicros

    // The memo key must carry the INDEX SEMANTICS, not just the broadcast:
    // ReuseExchange dedups canonically-equal IdentityBroadcastMode
    // exchanges, so a plan with TWO as-of joins over the same reference
    // table (e.g. AsOf.joinNearest's backward + forward legs) hands both
    // legs ONE broadcast id — and an id-only memo would serve the second
    // leg an index sorted by the FIRST leg's time expression (forward
    // negates it), turning its binary search into garbage matches. The
    // expressions' exprIds differ per leg, so their text disambiguates.
    val indexKey = (broadcastRows.id,
      (rTimeExpr +: tiebreak).map(_.toString).mkString("|"))

    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, leftOut)
      // Built once per executor (memoized on broadcast id + index
      // semantics): sort right rows per key by (time, tiebreak...); the
      // last index with time <= t is then the deterministic backward match.
      val index = BroadcastAsOfJoinExec.indexFor(indexKey, () => {
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
        val rTimeBound = BindReferences.bindReference(rTimeExpr, rightOut)
        val sortOrd = RowOrdering.create(
          (rTimeExpr +: tiebreak).map(SortOrder(_, Ascending)), rightOut)
        broadcastRows.value.iterator
          .map(r => (rKeyProj(r).copy(), r))
          .filter { case (k, r) => !k.anyNull && rTimeBound.eval(r) != null }
          .toSeq
          .groupBy(_._1)
          .map { case (k, rows) =>
            val sorted = rows.map(_._2).sortWith((a, b) => sortOrd.compare(a, b) < 0).toArray
            (k, (sorted.map(r => rTimeBound.eval(r).asInstanceOf[Long]), sorted))
          }
      })

      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      lIter.map { l =>
        numOutputRows += 1
        val lKey = lKeyProj(l)
        val lTimeV = lTimeBound.eval(l)
        if (lKey.anyNull || lTimeV == null) joined(l, nullRight)
        else {
          val lt = lTimeV.asInstanceOf[Long]
          index.get(lKey) match {
            case Some((times, rows)) =>
              // Greatest index with times(i) <= lt (times ascending).
              var lo = 0; var hi = times.length - 1; var best = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= lt) { best = mid; lo = mid + 1 } else hi = mid - 1
              }
              if (best >= 0 && tol.forall(t => lt - times(best) <= t)) {
                numMatched += 1
                joined(l, rows(best))
              } else joined(l, nullRight)
            case None => joined(l, nullRight)
          }
        }
      }
    }
  }
}

object BroadcastAsOfJoinExec {
  private type Index = Map[UnsafeRow, (Array[Long], Array[InternalRow])]
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Index]()

  /** Per-executor memo of the broadcast-side index, keyed on
    * (broadcast id, time+tiebreak expression text) — the broadcast id
    * alone is NOT unique to one index shape once ReuseExchange dedups
    * equal broadcasts across as-of joins with different directions (see
    * doExecute). Entries are bounded by the broadcast threshold; the map
    * is cleared wholesale if a long session accumulates many distinct
    * broadcasts.
    */
  private[plans] def indexFor(key: (Long, String), build: () => Index): Index = {
    if (cache.size > 128) cache.clear()
    cache.computeIfAbsent(key, _ => build())
  }
}
