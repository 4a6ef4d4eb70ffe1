package graft.tools

/** Throwaway profiling probe for the b1/b2 BM25 paths. */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      spark.catalog.clearCache()
      time("b1 total") {
        val df = graft.SparkEntry.queries("b1_bm25_topk")(spark, dir)
        df.write.format("noop").mode("overwrite").save()
      }
      graft.engine.Caches.releaseAll()
      time("b2 total") {
        val df = graft.SparkEntry.queries("b2_bm25_store")(spark, dir)
        df.write.format("noop").mode("overwrite").save()
      }
      graft.engine.Caches.releaseAll()
      time("b2 probe-only") {
        val db = "graft_bm25_" + graft.queries.Tables.dirTag(dir)
        val d = spark.read.parquet(s"$dir/documents.parquet")
        val q = graft.ops.Retrieval.queriesFromDocs(d, "doc_id", "text",
          org.apache.spark.sql.functions.col("doc_id") >= 8 &&
            org.apache.spark.sql.functions.col("doc_id") < 13)
        graft.ops.Retrieval.bm25FromStore(spark, db, q, k = 5)
          .write.format("noop").mode("overwrite").save()
      }
      graft.engine.Caches.releaseAll()
    }
    spark.stop()
  }
}
