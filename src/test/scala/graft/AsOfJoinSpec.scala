package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf
import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The custom as-of join operator stack: semantics against a brute-force
  * reference, tolerance, null/tie handling, self-join safety, and the plan
  * shape (AsOfJoinExec present, left filters pushed below the join).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Deterministic synthetic trades/quotes (classic as-of shape).
  private def trades: DataFrame =
    Seq((1L, 100L, "A"), (1L, 250L, "B"), (2L, 50L, "C"), (3L, 999L, "D"))
      .toDF("k", "t", "tag")
  private def quotes: DataFrame =
    Seq((1L, 90L, 1.0), (1L, 100L, 2.0), (1L, 200L, 3.0), (1L, 300L, 4.0),
      (2L, 60L, 5.0))
      .toDF("k", "t", "px")

  private def asOf(tol: Option[Long] = None): Seq[(Long, Long, String, Option[Double])] =
    AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t", toleranceMicros = tol)
      .select($"k", $"t", $"tag", $"px_r")
      .as[(Long, Long, String, Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("backward as-of picks the greatest right time <= left time") {
    assert(asOf() === Seq(
      (1L, 100L, "A", Some(2.0)),  // exact-time match counts
      (1L, 250L, "B", Some(3.0)),  // 200 < 250 < 300
      (2L, 50L, "C", None),        // nothing at-or-before 50
      (3L, 999L, "D", None)))      // key with no right rows
  }

  test("tolerance drops stale matches") {
    assert(asOf(tol = Some(10L)) === Seq(
      (1L, 100L, "A", Some(2.0)),  // gap 0 <= 10
      (1L, 250L, "B", None),       // gap 50 > 10
      (2L, 50L, "C", None),
      (3L, 999L, "D", None)))
  }

  test("equal right times break ties by the tiebreak column (last wins)") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L, 7L, "lo"), (1L, 100L, 9L, "hi"), (1L, 100L, 8L, "mid"))
      .toDF("k", "t", "id", "tag")
    val got = AsOf.joinBackward(l, r, Seq("k"), "t", "t", tiebreak = Seq("id"))
      .select($"tag_r").as[String].collect().toSeq
    assert(got === Seq("hi"))
  }

  test("null keys and null times never match") {
    val l = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(50L), 1.0), (None, Some(40L), 2.0),
      (Some(1L), None, 3.0)).toDF("k", "t", "px")
    val got = AsOf.joinBackward(l, r, Seq("k"), "t", "t")
      .select($"tag", $"px_r").as[(String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", Some(1.0)), ("b", None), ("c", None)))
  }

  test("self-join: suffixed columns, fresh attribute ids") {
    val ev = Seq((1L, 10L, "x"), (1L, 20L, "y")).toDF("k", "t", "tag")
    val got = AsOf.joinBackward(ev, ev, Seq("k"), "t", "t", tiebreak = Seq("t"))
      .select($"t", $"t_r", $"tag_r")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((10L, 10L, "x"), (20L, 20L, "y")))
  }

  test("matches a brute-force reference on 2k random-ish rows") {
    val l = spark.range(2000).select(
      (col("id") % 37).as("k"),
      ((col("id") * 2654435761L) % 10000).as("t"),
      col("id").as("lid"))
    val r = spark.range(3000).select(
      (col("id") % 41).as("k"),
      ((col("id") * 40503L) % 10000).as("t"),
      col("id").as("rid"))
    val got = AsOf.joinBackward(l, r, Seq("k"), "t", "t", tiebreak = Seq("rid"))
      .select($"lid", $"rid_r").as[(Long, Option[Long])]
      .collect().toMap
    val lRows = l.as[(Long, Long, Long)].collect()
    val rRows = r.as[(Long, Long, Long)].collect()
    val byKey = rRows.groupBy(_._1)
    for ((k, t, lid) <- lRows) {
      val want = byKey.getOrElse(k, Array.empty)
        .filter(_._2 <= t).sortBy(q => (q._2, q._3)).lastOption.map(_._3)
      assert(got(lid) === want, s"lid=$lid k=$k t=$t")
    }
  }

  test("plan uses AsOfJoinExec and pushes left filters below the join") {
    val joined = AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t")
      .filter($"tag" === "A")
    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
    // Optimizer: the left-only filter must sit under the AsOfJoin node.
    val opt = qe.optimizedPlan
    val aj = opt.collectFirst { case a: AsOfJoin => a }
    assert(aj.isDefined, s"no AsOfJoin in optimized plan:\n$opt")
    assert(aj.get.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isDefined, s"left filter not pushed below AsOfJoin:\n$opt")
    // Physical: our exec node, whether or not AQE wraps the plan.
    val sp = qe.executedPlan
    val whole = sp match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    assert(whole.collect { case p: AsOfJoinExec => p }.nonEmpty,
      s"no AsOfJoinExec in physical plan:\n$sp")
    assert(joined.count() === 1)
  }
}
