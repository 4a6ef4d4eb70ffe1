package graft.tools

/** Throwaway: v15 timing before/after shortlist persists. */
object ProbeV15 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.local("32")
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { rep =>
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("v15_recall_at_k")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"v15 rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.engine.Caches.releaseAll()
    }
    spark.stop()
  }
}
