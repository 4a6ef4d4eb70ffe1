package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventWindows

/** Weekly cohort retention: cohort = ISO week (Monday-truncated) of first
  * activity; each (cohort, week-offset) cell counts distinct users active
  * that week; retention is an exact e6 floor division.
  */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2024-01-01 is a Monday: weeks W0=01-01, W1=01-08, W2=01-15, W3=01-22.
  // Mid-week timestamps exercise the truncation.
  private def at(day: String, hour: Int) =
    Timestamp.valueOf(s"2024-01-$day $hour:30:00")

  // u1: cohort W0, active W0, W1, W3 (two events in W1 — distinct once).
  // u2: cohort W0, active W0 only.
  // u3: cohort W1, active W1 and W2.
  private def events = Seq(
    (1L, at("03", 9)), (1L, at("10", 9)), (1L, at("11", 20)), (1L, at("24", 1)),
    (2L, at("01", 0)),
    (3L, at("08", 12)), (3L, at("17", 23))
  ).toDF("user_id", "ts")

  test("retention counts distinct users per (cohort, offset) with exact e6 rates") {
    val got = EventWindows.retention(events)
      .as[(java.sql.Date, Int, Long, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((2L, 2L, 1000000L)),
      ("2024-01-01", 1) -> ((1L, 2L, 500000L)),
      ("2024-01-01", 3) -> ((1L, 2L, 500000L)),
      ("2024-01-08", 0) -> ((1L, 1L, 1000000L)),
      ("2024-01-08", 1) -> ((1L, 1L, 1000000L))))
  }

  test("week 0 always retains the full cohort") {
    val rows = EventWindows.retention(events)
      .as[(java.sql.Date, Int, Long, Long, Long)].collect()
    for ((_, off, nActive, cohortN, retE6) <- rows if off == 0)
      assert(nActive == cohortN && retE6 == 1000000L)
  }
}
