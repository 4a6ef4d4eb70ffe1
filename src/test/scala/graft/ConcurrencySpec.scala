package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventWindows

/** Sweep-line session concurrency: per-day max simultaneously-open
  * sessions, closed-interval semantics (touching sessions count), starts
  * ordered before ends at a tied instant.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def at(day: Int, hm: String) =
    Timestamp.valueOf(f"2024-03-$day%02d $hm:00")

  // Day 1: u1 session [10:00, 10:10]; u2 instant session at 10:05 (inside
  // u1 → peak 2); u3 instant session at exactly 10:10 (TOUCHES u1's end —
  // closed intervals: still concurrent); u4 alone at 12:00.
  // Day 2: u1 alone.
  private def events = Seq(
    (1L, at(1, "10:00"), 100L, 1.0), (1L, at(1, "10:10"), 101L, 1.0),
    (2L, at(1, "10:05"), 102L, 1.0),
    (3L, at(1, "10:10"), 103L, 1.0),
    (4L, at(1, "12:00"), 104L, 1.0),
    (1L, at(2, "09:00"), 105L, 1.0), (1L, at(2, "09:05"), 106L, 1.0)
  ).toDF("user_id", "ts", "event_id", "value")

  test("per-day max concurrency, touching sessions count as concurrent") {
    val got = EventWindows.concurrency(events, gapMinutes = 30)
      .as[(java.sql.Date, Int, Long)].collect()
      .map(r => r._1.toString -> (r._2, r._3)).toMap
    assert(got == Map(
      "2024-03-01" -> ((2, 8L)), // peak: u2 inside u1; u3 touches u1's end
      "2024-03-02" -> ((1, 2L))))
    graft.engine.Caches.releaseAll()
  }

  test("concurrency is partitioning-invariant") {
    val a = EventWindows.concurrency(events, 30)
      .as[(java.sql.Date, Int, Long)].collect().toSet
    graft.engine.Caches.releaseAll()
    val b = EventWindows.concurrency(events.repartition(7), 30)
      .as[(java.sql.Date, Int, Long)].collect().toSet
    graft.engine.Caches.releaseAll()
    assert(a == b)
  }
}
