package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf
import graft.plans.{AsOfJoin, AsOfJoinExec, BroadcastAsOfJoinExec}

/** The custom as-of join operator stack: semantics against a brute-force
  * reference on BOTH physical paths (partitioned merge and broadcast),
  * tolerance, null/tie handling, self-join safety, cost-based plan choice,
  * and the filter-pushdown rule.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run `f` with the broadcast threshold pinned (-1 forces the merge path;
    * the default serves small sides via broadcast).
    */
  private def withThreshold[A](v: String)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def bothPaths[A](f: => A): Seq[(String, A)] =
    Seq("broadcast" -> withThreshold("10485760")(f),
      "merge" -> withThreshold("-1")(f))

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

  test("backward as-of picks the greatest right time <= left time (both paths)") {
    for ((path, got) <- bothPaths(asOf()))
      assert(got === Seq(
        (1L, 100L, "A", Some(2.0)),  // exact-time match counts
        (1L, 250L, "B", Some(3.0)),  // 200 < 250 < 300
        (2L, 50L, "C", None),        // nothing at-or-before 50
        (3L, 999L, "D", None)), s"path=$path")
  }

  test("tolerance drops stale matches (both paths)") {
    for ((path, got) <- bothPaths(asOf(tol = Some(10L))))
      assert(got === Seq(
        (1L, 100L, "A", Some(2.0)),  // gap 0 <= 10
        (1L, 250L, "B", None),       // gap 50 > 10
        (2L, 50L, "C", None),
        (3L, 999L, "D", None)), s"path=$path")
  }

  test("equal right times break ties by the tiebreak column (both paths)") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L, 7L, "lo"), (1L, 100L, 9L, "hi"), (1L, 100L, 8L, "mid"))
      .toDF("k", "t", "id", "tag")
    for ((path, got) <- bothPaths(
        AsOf.joinBackward(l, r, Seq("k"), "t", "t", tiebreak = Seq("id"))
          .select($"tag_r").as[String].collect().toSeq))
      assert(got === Seq("hi"), s"path=$path")
  }

  test("null keys and null times never match (both paths)") {
    val l = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(50L), 1.0), (None, Some(40L), 2.0),
      (Some(1L), None, 3.0)).toDF("k", "t", "px")
    for ((path, got) <- bothPaths(
        AsOf.joinBackward(l, r, Seq("k"), "t", "t")
          .select($"tag", $"px_r").as[(String, Option[Double])]
          .collect().sortBy(_._1).toSeq))
      assert(got === Seq(("a", Some(1.0)), ("b", None), ("c", None)), s"path=$path")
  }

  test("forward as-of picks the smallest right time >= left time (both paths)") {
    val got = bothPaths(
      AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t") // sanity anchor
        .count())
    assert(got.forall(_._2 == 4))
    for ((path, fwd) <- bothPaths(
        AsOf.joinForward(trades, quotes, Seq("k"), "t", "t")
          .select($"k", $"t", $"tag", $"px_r")
          .as[(Long, Long, String, Option[Double])]
          .collect().sortBy(r => (r._1, r._2)).toSeq))
      assert(fwd === Seq(
        (1L, 100L, "A", Some(2.0)),  // exact time matches forward too
        (1L, 250L, "B", Some(4.0)),  // next quote at 300
        (2L, 50L, "C", Some(5.0)),   // 60 >= 50
        (3L, 999L, "D", None)), s"path=$path")
  }

  test("forward tolerance bounds the look-ahead") {
    val got = AsOf.joinForward(trades, quotes, Seq("k"), "t", "t",
        toleranceMicros = Some(10L))
      .select($"tag", $"px_r").as[(String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("A", Some(2.0)),   // gap 0
      ("B", None),        // next at 300, gap 50 > 10
      ("C", Some(5.0)),   // gap 10 <= 10
      ("D", None)))
  }

  test("self-join: suffixed columns, fresh attribute ids") {
    val ev = Seq((1L, 10L, "x"), (1L, 20L, "y")).toDF("k", "t", "tag")
    val got = AsOf.joinBackward(ev, ev, Seq("k"), "t", "t", tiebreak = Seq("t"))
      .select($"t", $"t_r", $"tag_r")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((10L, 10L, "x"), (20L, 20L, "y")))
  }

  test("matches a brute-force reference on 2k pseudo-random rows (both paths)") {
    val l = spark.range(2000).select(
      (col("id") % 37).as("k"),
      ((col("id") * 2654435761L) % 10000).as("t"),
      col("id").as("lid"))
    val r = spark.range(3000).select(
      (col("id") % 41).as("k"),
      ((col("id") * 40503L) % 10000).as("t"),
      col("id").as("rid"))
    val lRows = l.as[(Long, Long, Long)].collect()
    val byKey = r.as[(Long, Long, Long)].collect().groupBy(_._1)
    val want = lRows.map { case (k, t, lid) =>
      lid -> byKey.getOrElse(k, Array.empty)
        .filter(_._2 <= t).sortBy(q => (q._2, q._3)).lastOption.map(_._3)
    }.toMap
    for ((path, got) <- bothPaths(
        AsOf.joinBackward(l, r, Seq("k"), "t", "t", tiebreak = Seq("rid"))
          .select($"lid", $"rid_r").as[(Long, Option[Long])]
          .collect().toMap))
      assert(got === want, s"path=$path")
  }

  private def executedPlan(df: DataFrame) = {
    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(df)
    df.write.format("noop").mode("overwrite").save()
    qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  test("joinNearest picks the closer side; ties go backward; works on long axes") {
    // (1,100): exact match both sides → 100. (1,250): 200 vs 300, tie →
    // backward 200. (1,260): 200 (gap 60) vs 300 (gap 40) → forward 300.
    // (2,50): backward empty → forward 60. (3,999): no quotes → null.
    val t2 = trades.unionByName(Seq((1L, 260L, "E")).toDF("k", "t", "tag"))
    for ((path, got) <- bothPaths(
        AsOf.joinNearest(t2, quotes, Seq("k"), "t", "t", keyCols = Seq("tag"))
          .select($"tag", $"t_r").as[(String, Option[Long])]
          .collect().sortBy(_._1).toSeq))
      assert(got === Seq(
        ("A", Some(100L)), ("B", Some(200L)), ("C", Some(60L)),
        ("D", None), ("E", Some(300L))), s"path=$path")
  }

  test("cost-based physical choice: broadcast for small right, merge otherwise") {
    val joined = AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t")
    withThreshold("10485760") {
      val plan = executedPlan(AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t"))
      assert(plan.collect { case p: BroadcastAsOfJoinExec => p }.nonEmpty,
        s"expected broadcast as-of:\n$plan")
    }
    withThreshold("-1") {
      val plan = executedPlan(AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t"))
      assert(plan.collect { case p: AsOfJoinExec => p }.nonEmpty,
        s"expected merge as-of:\n$plan")
    }
  }

  test("optimizer pushes left-only filters below the as-of join") {
    val joined = AsOf.joinBackward(trades, quotes, Seq("k"), "t", "t")
      .filter($"tag" === "A")
    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
    val opt = qe.optimizedPlan
    val aj = opt.collectFirst { case a: AsOfJoin => a }
    assert(aj.isDefined, s"no AsOfJoin in optimized plan:\n$opt")
    assert(aj.get.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isDefined, s"left filter not pushed below AsOfJoin:\n$opt")
    assert(joined.count() === 1)
  }
}
