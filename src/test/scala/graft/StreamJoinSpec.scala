package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingWindows

/** Two more Structured Streaming shapes over the same event operators:
  * a watermarked stream-stream interval join (the streaming form of
  * RangeJoin) and exactly-once dedup via dropDuplicatesWithinWatermark.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_id", LongType),
    StructField("kind", StringType)))

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("sj").toString
    rows.toDF("user_id", "s", "event_id", "kind")
      .select(col("user_id"),
        expr("timestamp_micros((s + 10000000) * 1000000)").as("ts"),
        col("event_id"), col("kind"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def stream(dir: String) =
    spark.readStream.schema(schema).parquet(dir)

  test("watermarked stream-stream interval join pairs clicks to purchases") {
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "click"), (1L, 100L, 2L, "purchase"),   // within 5 min
      (1L, 400L, 3L, "purchase"),                          // 400s > 300s gap
      (2L, 0L, 4L, "click"), (2L, 10L, 5L, "click"),
      (2L, 200L, 6L, "purchase")))                         // joins both clicks
    val ev = stream(dir)
    val clicks = ev.filter($"kind" === "click")
      .select($"user_id", $"ts".as("c_ts"), $"event_id".as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = ev.filter($"kind" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    val joined = clicks.join(purchases,
      expr("""user_id = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval 5 minutes"""))
      .select($"c_id", $"p_id")
    val out = StreamingWindows.runToMemory(
      joined, "sj_" + System.nanoTime(), OutputMode.Append())
    val got = out.as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (4L, 6L), (5L, 6L)))
  }

  test("dropDuplicatesWithinWatermark dedups replayed events") {
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "click"), (1L, 1L, 1L, "click"),  // same id replayed
      (1L, 2L, 2L, "click")))
    val deduped = stream(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select($"event_id")
    val out = StreamingWindows.runToMemory(
      deduped, "sjd_" + System.nanoTime(), OutputMode.Append())
    assert(out.as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }
}
