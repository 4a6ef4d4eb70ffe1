package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: stage-level breakdown of b1_bm25_topk. */
object ProbeBm25b {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.engine.Caches.Registered
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val post = time("postings+persist") {
        val p = graft.ops.Retrieval.postings(d, "doc_id", "text").persistTracked()
        p.count(); p
      }
      val q = time("qterms") {
        val x = graft.ops.Retrieval.queriesFromDocs(d, "doc_id", "text", col("doc_id") < 8)
        x.count(); x
      }
      time("stats") { graft.ops.Retrieval.corpusStats(post).count() }
      time("dfreq") { graft.ops.Retrieval.documentFrequencies(post).count() }
      time("full chain") {
        graft.ops.Retrieval.bm25TopK(d, "doc_id", "text", q, k = 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
