package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: why does e11's foreachBatch append nothing? */
object ProbeE11 {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.Session.local("8")
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val db = "graft_sigstore_probe"
    val dbLoc = graft.queries.Tables.scratch(db + "_db")
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dbLoc'")
    graft.ops.Bucketing.reset(s, s"$db.sig_bkt",
      new java.io.File(dbLoc, "sig_bkt"))
    graft.ops.Bucketing.writeBucketed(
      graft.ops.Dedup.lshBuckets(graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingleHashes(
          s.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") >= 50)))),
      s"$db.sig_bkt", nBuckets = 8, keys = Seq("band", "band_key"))
    println(s"BEFORE table rows=${s.table(s"$db.sig_bkt").count()}")
    val delta = s.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(col("doc_id") < 50)
    graft.streaming.StreamingWindows.runForeachBatch(delta, "probe_e11") {
      (batch, id) =>
        println(s"BATCH $id rows=${batch.count()} session-eq=${batch.sparkSession eq s}")
        try {
          graft.ops.Bucketing.appendBucketed(
            graft.ops.Dedup.lshBuckets(graft.ops.Dedup.minhashSignatures(
              graft.ops.Dedup.shingleHashes(batch))),
            s"$db.sig_bkt", nBuckets = 8, keys = Seq("band", "band_key"))
          println(s"BATCH $id append OK")
        } catch { case e: Throwable =>
          println(s"BATCH $id append FAILED: ${e.getClass.getName}: ${e.getMessage}")
        }
    }
    println(s"AFTER table rows=${s.table(s"$db.sig_bkt").count()}")
    s.stop()
  }
}
