package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Probe the actual watermark progression of the e16 shape: run the
  * windowed agg over the 2-file staged dir and dump each batch's
  * eventTime stats from StreamingQueryProgress.
  * Run: sbt "Test/runMain graft.tools.ProbeE16b <sfDir>"
  */
object ProbeE16b {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.Session.local("8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val stage = new java.io.File("/tmp/probe_e16_stage")
    require(stage.isDirectory, "run ProbeE16 first to stage files")
    val stream = s.readStream
      .schema(s.read.parquet(stage.getAbsolutePath).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.getAbsolutePath)
    val agg = stream
      .withWatermark("ts", "360 hours")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("v_e3").as("sum_v_e3"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_v_e3"))
    val ck = new java.io.File("/tmp/probe_e16_ck")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(ck)
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("probe_e16b")
      .option("checkpointLocation", ck.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
        s"eventTime=${p.eventTime}")
    }
    println(s"PROBE result rows=${s.table("probe_e16b").count()}")
  }
}
