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
}
