package graft.tools

/** Throwaway: bench the round-12 second-wave queries at sf0.1. */
object ProbeNew12 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("b1_bm25_topk", "b2_bm25_store", "b3_hybrid_rrf",
      "b4_retrieval_mrr", "t19_ppl_buckets", "t20_winnowing",
      "t21_classifier_gate", "o19_curriculum", "s12_zorder_pruning")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      qs.foreach { q =>
        graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
