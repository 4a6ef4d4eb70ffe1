package graft.tools

import org.apache.spark.sql.functions._

/** Probe: does a 2-file staged dir + maxFilesPerTrigger=1 produce two
  * AvailableNow micro-batches, and does the watermark advance between
  * them? Run: sbt "Test/runMain graft.tools.ProbeE16 <sfDir>"
  */
object ProbeE16 {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.Session.local("8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val stage = new java.io.File("/tmp/probe_e16_stage")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(stage); stage.mkdirs()
    val ev = graft.queries.Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("ts"),
        expr("CAST(round(value * 1000, 0) AS BIGINT)").as("v_e3"))
    for (i <- 0 to 1) {
      val tmp = new java.io.File(stage, s"_tmp$i")
      ev.filter(pmod(col("event_id"), lit(2)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stage, s"p$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1700000000000L + i * 3600000L)
      rm(tmp)
    }
    val stream = s.readStream
      .schema(s.read.parquet(stage.getAbsolutePath).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.getAbsolutePath)
    graft.streaming.StreamingWindows.runForeachBatch(stream, "probe_e16") {
      (batch, id) =>
        val files = batch.select(input_file_name()).distinct()
          .collect().map(_.getString(0).split("/").last).toSeq.sorted
        println(s"PROBE batch=$id rows=${batch.count()} files=$files")
    }
  }
}
