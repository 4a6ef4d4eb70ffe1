package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Custom-state sessionization: `flatMapGroupsWithState` with event-time
  * timeouts, the KeyValueGroupedDataset path for semantics the built-in
  * `session_window` can't express (here: emit a session exactly once, when
  * the watermark proves no further event can join it).
  *
  * State per user is the open-session list (usually length 1); events merge
  * into sessions by the gap rule (an event at most `gap` after a session's
  * end extends it, and may bridge two open sessions). A session closes —
  * is emitted and dropped from state — when `end + gap < watermark`, so
  * output is append-mode and each session appears exactly once. State is
  * bounded by the watermark: nothing older than (watermark - gap) is ever
  * kept, the property that lets this run forever on an unbounded stream.
  *
  * Watermark note: Spark tracks watermarks in MILLIseconds while event
  * times here are microseconds — the close condition uses the
  * ms-truncated watermark, and the batch oracle replicates that exactly.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Exact micros from a java.sql.Timestamp (getTime is ms, getNanos has
    * the full sub-second part).
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L
  case class Sess(user_id: Long, startUs: Long, endUs: Long, n: Long, sum: Double)
  case class SessState(sessions: Seq[Sess])

  /** Merge sorted trivial/open sessions: any two sessions within `gapUs`
    * of each other collapse (an event can bridge them).
    */
  private def normalize(sessions: Seq[Sess], gapUs: Long): Seq[Sess] = {
    val sorted = sessions.sortBy(s => (s.startUs, s.endUs))
    val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
    for (s <- sorted) {
      if (out.nonEmpty && s.startUs <= out.last.endUs + gapUs) {
        val p = out.remove(out.length - 1)
        out += Sess(p.user_id, p.startUs, math.max(p.endUs, s.endUs),
          p.n + s.n, p.sum + s.sum)
      } else out += s
    }
    out.toSeq
  }

  private def stateFn(gapUs: Long)(
      user: Long, it: Iterator[Ev], state: GroupState[SessState]): Iterator[Sess] = {
    val wUs = state.getCurrentWatermarkMs() * 1000L
    val incoming = it.map { e =>
      val t = micros(e.ts); Sess(user, t, t, 1L, e.value)
    }.toSeq
    val sessions = normalize(state.getOption.map(_.sessions).getOrElse(Nil) ++ incoming, gapUs)
    val (closed, open) = sessions.partition(_.endUs + gapUs < wUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessState(open))
      // Fire once the ms watermark first exceeds the earliest close time.
      state.setTimeoutTimestamp(open.map(_.endUs + gapUs).min / 1000L + 1L)
    }
    closed.iterator
  }

  /** Streaming sessions over an event frame with `ts` (timestamp),
    * `user_id`, `value`. Emits each closed session once (append mode).
    */
  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // The watermarked `ts` column must reach the stateful operator itself.
    val typed: Dataset[Ev] = events
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Sess](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(stateFn(gapUs))
      .select(col("user_id"),
        expr("timestamp_micros(startUs)").as("session_start"),
        expr("timestamp_micros(endUs)").as("session_end"),
        col("n").as("n_events"),
        round(col("sum"), 3).as("sum_value"))
  }
}
