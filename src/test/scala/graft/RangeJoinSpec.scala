package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Binned range join: exact window semantics (boundaries, cross-bucket
  * pairs, no duplicates) and a plan with no nested-loop/cartesian join.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long) = expr(s"timestamp_micros($us)")

  test("window boundaries: strict lower, inclusive upper, cross-bucket") {
    // window = 100us buckets; pairs at gaps 100 (in), 101 (out), 0 (out).
    val rows = Seq((1L, 0L, 10L), (1L, 100L, 11L), (1L, 201L, 12L),
      (1L, 95L, 13L), (1L, 150L, 14L), (2L, 0L, 20L))
    val df = rows.toDF("u", "t_us", "eid")
      .select(col("u"), expr("timestamp_micros(t_us)").as("ts"), col("eid"))
    val got = RangeJoin.pairsWithin(df, "u", "ts", "eid", windowMicros = 100L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 11L),  // gap 100 == window, inclusive
      (10L, 13L),  // gap 95, same bucket
      (13L, 11L),  // gap 5, cross-bucket (95 -> 100)
      (13L, 14L),  // gap 55
      (11L, 14L),  // gap 50
      (14L, 12L))) // gap 51, cross-bucket
  }

  test("matches brute force on 1500 pseudo-random events, no duplicate pairs") {
    val df = spark.range(1500).select(
      (col("id") % 11).as("u"),
      expr("timestamp_micros((id * 2654435761) % 1000000)").as("ts"),
      col("id").as("eid"))
    val got = RangeJoin.pairsWithin(df, "u", "ts", "eid", windowMicros = 5000L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(got.distinct.size === got.size, "binning produced duplicate pairs")
    val rows = df.select($"u", unix_micros($"ts"), $"eid")
      .as[(Long, Long, Long)].collect()
    val brute = (for {
      (ua, ta, ia) <- rows
      (ub, tb, ib) <- rows
      if ua == ub && tb > ta && tb <= ta + 5000L
    } yield (ia, ib)).toSet
    assert(got.toSet === brute)
  }

  test("plan is a keyed join — no cartesian or nested-loop") {
    val df = spark.range(100).select(
      (col("id") % 5).as("u"),
      expr("timestamp_micros(id * 1000)").as("ts"),
      col("id").as("eid"))
    val joined = RangeJoin.pairsWithin(df, "u", "ts", "eid", 5000L)
    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
    joined.write.format("noop").mode("overwrite").save()
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val bad = plan.collect {
      case p: CartesianProductExec       => p
      case p: BroadcastNestedLoopJoinExec => p
    }
    assert(bad.isEmpty, s"range join planned as nested loop:\n$plan")
  }
}
