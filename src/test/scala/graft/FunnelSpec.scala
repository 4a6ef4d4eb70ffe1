package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventWindows

/** Ordered-funnel semantics: each step's first timestamp must be at or
  * after the previous step's first chained timestamp.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  // u1 converts fully in order; u2 purchases BEFORE viewing (must not
  // count) then clicks after; u3 views only; u4 never views (excluded).
  private def events = Seq(
    (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
    (2L, "purchase", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(15)),
    (3L, "view", ts(40)),
    (4L, "click", ts(1)), (4L, "purchase", ts(2))
  ).toDF("user_id", "event_type", "ts")

  test("funnel chains steps in time order; out-of-order steps don't count") {
    val got = EventWindows.funnel(events, Seq("view", "click", "purchase"))
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // u4 never viewed
    assert(got(1L) == ((ts(10), Some(ts(20)), Some(ts(30)))))
    // u2: the pre-view purchase at t=5 must NOT satisfy step 3.
    assert(got(2L) == ((ts(10), Some(ts(15)), None)))
    assert(got(3L) == ((ts(40), None, None)))
  }

  test("funnel equal timestamps chain (at-or-after, not strictly-after)") {
    val same = Seq((7L, "view", ts(1)), (7L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = EventWindows.funnel(same, Seq("view", "click"))
      .as[(Long, Timestamp, Option[Timestamp])].collect()
    assert(got.toSeq == Seq((7L, ts(1), Some(ts(1)))))
  }
}
