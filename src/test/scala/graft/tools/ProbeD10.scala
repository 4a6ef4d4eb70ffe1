package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiling probe for the d10 gate path. */
object ProbeD10 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 200)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      spark.catalog.clearCache()
      val sh = time("simhash")(
        { val x = graft.ops.Dedup.simhash(docs); x.count(); x })
      val pairs = time("pairs")(
        { val p = graft.ops.Dedup.simhashPairs(sh, 3).select("doc_a", "doc_b")
          println("n_pairs=" + p.count()); p })
      time("cc")(
        println("n_labels=" + graft.ops.Dedup.connectedComponents(pairs).count()))
    }
    spark.stop()
  }
}
