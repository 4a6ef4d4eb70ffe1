package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.EventWindows
import Tables.{t, events => eventsT}

/** Event-stream query surface: tumbling/sliding/session windows + JSON props
  * extraction. Batch forms here (oracle-checkable); streaming forms with
  * watermarks in graft.streaming.StreamingWindows share the same operators.
  */
object Events {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e1_tumbling" -> ((s, dir) =>
      EventWindows.tumbling(eventsT(s, dir), "15 minutes")),

    "e2_sliding" -> ((s, dir) =>
      EventWindows.sliding(eventsT(s, dir), "1 hour", "15 minutes")),

    "e3_session" -> ((s, dir) =>
      EventWindows.sessions(eventsT(s, dir), gapMinutes = 30)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")),

    // Structured Streaming execution of the tumbling window: same result as
    // e1 (and the same oracle), produced incrementally through a stream +
    // memory sink. Proves the streaming path inside the driver gate.
    "e5_streaming_tumbling" -> ((s, dir) => {
      Tables.events(s, dir) // ensures nanosAsLong conf is set
      val raw = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType))))
        .option("pathGlobFilter", "events.parquet") // stream source needs a dir
        .parquet(dir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val agg = graft.streaming.StreamingWindows.tumbling(raw, "15 minutes", "1 hour")
      graft.streaming.StreamingWindows.runToMemory(
        agg, "e5_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    }),

    // F8 over semi-structured props: JSON field extraction + aggregate.
    "e4_json_props" -> ((s, dir) =>
      eventsT(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          round(avg("k"), 6).as("avg_k")))
  )

  private val tumblingOracle =
    """SELECT time_bucket(INTERVAL '15 minutes', ts) AS wstart, event_type,
      | count(*) AS n, round(sum(value), 3) AS sum_value
      |FROM events GROUP BY wstart, event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "e5_streaming_tumbling" -> tumblingOracle,
    "e1_tumbling" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS wstart, event_type,
        | count(*) AS n, round(sum(value), 3) AS sum_value
        |FROM events GROUP BY wstart, event_type""".stripMargin,
    "e2_sliding" ->
      """WITH offs AS (SELECT unnest([0, 1, 2, 3]) AS o),
        |hits AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - to_minutes(15 * o) AS wstart,
        |         event_type, value
        |  FROM events CROSS JOIN offs)
        |SELECT wstart, event_type, count(*) AS n, round(sum(value), 3) AS sum_value
        |FROM hits GROUP BY wstart, event_type""".stripMargin,
    "e3_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, sum(new_session) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 3) AS sum_value
        |FROM numbered GROUP BY user_id, session_no""".stripMargin,
    "e4_json_props" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
        | round(avg(CAST(props->>'k' AS INT)), 6) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
