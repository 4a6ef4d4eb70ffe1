package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-window operators over the events stream table (SURVEY.md §2.9
  * extension target): tumbling, sliding, and session windows, expressed as
  * batch DataFrame ops so they are oracle-checkable; the Structured Streaming
  * forms (same semantics, plus watermarks) live in graft.streaming.
  */
object EventWindows {

  /** Tumbling windows: group by `window(ts, width)` — epoch-aligned, same
    * boundaries as DuckDB's time_bucket.
    */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows: width `width`, slide `slide`; each event lands in
    * width/slide windows.
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user with `gapMinutes` inactivity gap — classic
    * gaps-and-islands so batch and oracle agree exactly. For streaming use
    * session_window / flatMapGroupsWithState (graft.streaming).
    *
    * Scale note: the window is partitioned by user_id — parallel across
    * users, no global sort.
    */
  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_no", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 3).as("sum_value"))
  }

  /** ORDERED funnel analysis — the event-analytics staple: per user, the
    * first occurrence of each step that happens AT OR AFTER the previous
    * step's first occurrence (first `steps(0)`, then the first
    * `steps(1)` ≥ it, …). A user converts through step k only if the
    * whole prefix chains in time order — a purchase BEFORE any view does
    * not count.
    *
    * Shape: ONE conditional-min aggregate per step, all map-side-partial
    * and keyed on the user — step k's aggregate filters on step k−1's
    * timestamp carried by a keyed join, so the chain is k shuffles of
    * (user, ts) pairs, never a per-user sort or window. Output: one row
    * per user with each step's first chained timestamp (NULL = never
    * reached).
    */
  /** WEEKLY COHORT RETENTION — the other event-analytics staple next to
    * [[funnel]]: users cohorted by the ISO week of their first activity;
    * for each (cohort, weeks-since) cell, how many of them were active
    * again. Output: cohort week, week offset, active count, cohort size,
    * and retention in e6 units (BIGINT floor division — bit-identical
    * cross-engine; week 0 is the cohort itself at retention 10⁶).
    *
    * Shape: one distinct on (user, week), one min-groupBy for the cohort,
    * one keyed join back on user_id, one count-groupBy — all keyed on the
    * user, no windows. The cohort-size frame is one row per WEEK of
    * corpus history (bounded by calendar time, not data volume), so it
    * broadcasts at any scale.
    */
  def retention(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val first = weeks.groupBy("user_id").agg(min("wk").as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_n"))
    weeks.join(first, "user_id")
      .select(col("cohort"),
        expr("CAST(datediff(wk, cohort) div 7 AS INT)").as("week_no"))
      .groupBy("cohort", "week_no")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("week_no"), col("n_active"), col("cohort_n"),
        expr("(n_active * 1000000) div cohort_n").as("retention_e6"))
  }

  /** SWEEP-LINE SESSION CONCURRENCY — the interval-stabbing profile:
    * how many sessions are simultaneously open, read at every session
    * boundary, rolled up to a per-day maximum (the capacity-planning /
    * load-profile readout). Intervals are CLOSED ([start, end] — two
    * sessions touching at an instant count as concurrent), pinned by
    * ordering all +1 boundary rows before −1 at the same timestamp.
    *
    * Shape: sessions → 2 boundary rows each (one explode) →
    * [[Split.globalCumSum]] over the total order (ts, delta desc,
    * user_id, session_start) → one day-keyed max-groupBy. A naive
    * overlap SELF-JOIN of the interval set is quadratic exactly where
    * load is high; the sweep is O(n log n) via one range shuffle, and
    * every intermediate value is an integer — bit-identical
    * cross-engine at any layout.
    */
  def concurrency(events: DataFrame, gapMinutes: Int): DataFrame = {
    val sess = sessions(events, gapMinutes)
      .select("user_id", "session_start", "session_end")
    val bounds = sess.select(col("user_id"), col("session_start"),
        explode(array(
          struct(col("session_start").as("ts"), lit(1).as("delta")),
          struct(col("session_end").as("ts"), lit(-1).as("delta")))).as("b"))
      .select(col("user_id"), col("session_start"),
        col("b.ts").as("ts"), col("b.delta").as("delta"))
    Split.globalCumSum(bounds, "delta",
        Seq(col("ts"), col("delta").desc, col("user_id"),
          col("session_start")), -1)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(max(col("cum")).cast("int").as("max_concurrent"),
        count(lit(1)).as("n_boundaries"))
  }

  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("ts_0"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"ts_$i"
      val cur = s"ts_${i + 1}"
      acc.join(
        events.filter(col("event_type") === step)
          .select(col("user_id"), col("ts").as("_t")),
        Seq("user_id"), "left")
        .groupBy((col("user_id") +: (0 to i).map(j => col(s"ts_$j"))): _*)
        .agg(min(when(col("_t") >= col(prev), col("_t"))).as(cur))
    }
  }
}
