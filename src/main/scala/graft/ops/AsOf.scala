package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, Literal, Multiply, UnixMicros}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.plans.{AsOfJoin, AsOfJoinStrategy, PushFilterThroughAsOfJoin}

/** User-facing as-of join (pandas `merge_asof` semantics, backward
  * direction): every left row gains the right row with equal `on` keys and
  * the greatest right time <= left time, or nulls when none exists.
  *
  * Right-side columns come back suffixed (default `_r`) — the projection
  * also mints fresh attribute ids, so self-joins (events-to-events) are
  * safe.
  *
  * Scale: executes as [[graft.plans.AsOfJoinExec]] — hash-partition both
  * sides on `on`, sort by (keys, time), one-pass merge per partition. See
  * that node's docs for why this is the 100 TB-safe plan.
  */
object AsOf {

  /** Install the as-of planner strategy + optimizer rule into a session.
    * Idempotent; `Session.prepare`/`Session.local` call it, as does
    * `GraftExtensions` via `spark.sql.extensions`.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.install(spark, AsOfJoinStrategy,
      Seq(graft.plans.RewriteAsOfMarkerJoin, PushFilterThroughAsOfJoin))

  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      tiebreak: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None,
      rightSuffix: String = "_r"): DataFrame =
    join(left, right, on, leftTimeCol, rightTimeCol, tiebreak,
      toleranceMicros, rightSuffix, forward = false)

  /** Forward as-of: the EARLIEST right row with time >= left time (the
    * "next reading after this event"). Same operators as backward with
    * both time axes negated — greatest(-t_r) <= -t_l is exactly
    * smallest(t_r) >= t_l — so merge and broadcast paths, pushdown rule,
    * and cost-based choice all apply unchanged. Ties on equal time break
    * toward the max tiebreak value (matching backward).
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      tiebreak: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None,
      rightSuffix: String = "_r"): DataFrame =
    join(left, right, on, leftTimeCol, rightTimeCol, tiebreak,
      toleranceMicros, rightSuffix, forward = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      tiebreak: Seq[String],
      toleranceMicros: Option[Long],
      rightSuffix: String,
      forward: Boolean): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    val spark = left.sparkSession
    install(spark)

    // Fresh exprIds + disjoint names for the right side (self-join safety).
    val clash = right.columns.map(_ + rightSuffix).toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"left columns collide with suffixed right columns: ${clash.mkString(", ")}")
    val renamed = right.select(
      right.columns.toIndexedSeq.map(c => col(c).as(c + rightSuffix)): _*)

    val lp = GraftBridge.analyzed(left)
    val rp = GraftBridge.analyzed(renamed)
    // Negation must preserve micros: Cast(timestamp, long) truncates to
    // seconds, so timestamps go through UnixMicros instead.
    def time(e: Expression): Expression =
      if (!forward) e
      else Multiply(e.dataType match {
        case TimestampType => UnixMicros(e)
        case _             => Cast(e, LongType)
      }, Literal(-1L))
    val plan = AsOfJoin(
      lp, rp,
      on.map(attr(lp, _)), on.map(k => attr(rp, k + rightSuffix)),
      time(asTime(attr(lp, leftTimeCol))),
      time(asTime(attr(rp, rightTimeCol + rightSuffix))),
      tiebreak.map(c => attr(rp, c + rightSuffix)),
      toleranceMicros)
    GraftBridge.ofRows(spark, plan)
  }

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"as-of join column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))

  /** The merge compares times as Long; timestamps already are micros
    * internally, anything else is cast.
    */
  private def asTime(a: Attribute): Expression = a.dataType match {
    case TimestampType | LongType => a
    case _                        => Cast(a, LongType)
  }
}
