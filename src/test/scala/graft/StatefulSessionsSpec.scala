package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StatefulSessions, StreamingWindows}

/** flatMapGroupsWithState sessionization driven over a genuinely multi-batch
  * file stream (maxFilesPerTrigger=1): sessions close exactly when the
  * advancing watermark proves them closed, events bridge open sessions, and
  * the tail session past the watermark is never emitted.
  */
class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** Write one stream file with a pinned mtime so batch order is stable. */
  private def writeBatch(dir: Path, name: String, mtimeMs: Long,
      rows: Seq[(Long, Long, Double)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("e6batch")
    // Offset from epoch 0: the initial watermark is 0, which would drop
    // genuine epoch-0 events as late.
    rows.toDF("user_id", "s", "value")
      .select(col("user_id"),
        expr(s"timestamp_micros((s + ${StatefulSessionsSpec.Base}) * 1000000)").as("ts"),
        col("value"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dest = dir.resolve(name)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
  }

  test("sessions close on watermark, bridge across batches, tail stays open") {
    val dir = Files.createTempDirectory("e6stream")
    val t0 = 1700000000000L
    // gap = 1 minute. Seconds-scale event times.
    writeBatch(dir, "f1.parquet", t0, Seq(
      (1L, 0L, 1.0), (1L, 30L, 2.0),   // u1 session [0,30]
      (2L, 0L, 5.0),                    // u2 session [0,0]
      (3L, 0L, 1.0), (3L, 100L, 1.0))) // u3: two open sessions, 100-0 > 60
    writeBatch(dir, "f2.parquet", t0 + 2000, Seq(
      (1L, 120L, 3.0),                  // u1 new session [120,120]
      (3L, 50L, 1.0)))                  // bridges u3's sessions -> [0,100]
    writeBatch(dir, "f3.parquet", t0 + 4000, Seq(
      (1L, 600L, 4.0)))                 // advances watermark to 600s

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val out = StreamingWindows.runToMemory(
      StatefulSessions.sessions(stream, gapMinutes = 1),
      "e6spec_" + System.nanoTime(), OutputMode.Append())

    val base = StatefulSessionsSpec.Base
    val got = out.select(col("user_id"),
        unix_micros(col("session_start")) / 1000000L - base,
        unix_micros(col("session_end")) / 1000000L - base,
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSet

    assert(got === Set(
      (1L, 0.0, 30.0, 2L, 3.0),    // closed once watermark passed 90s
      (2L, 0.0, 0.0, 1L, 5.0),
      (1L, 120.0, 120.0, 1L, 3.0), // closed by the final timeout batch
      (3L, 0.0, 100.0, 3L, 3.0)))  // bridged by the late 50s event
    // u1's [600,600] tail is NOT emitted: watermark never passed 660s.
    assert(!got.exists(_._2 == 600.0))
  }
}

object StatefulSessionsSpec {
  val Base = 10000000L
}
