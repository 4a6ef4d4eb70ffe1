package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: isolate the slow step inside Retrieval.postings. */
object ProbeBm25c {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val ws = graft.ops.TextOps.tokens(col("text"))
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      time("explode only") {
        d.select(col("doc_id"), explode(ws).as("term")).count()
      }
      time("explode+size") {
        d.select(col("doc_id"), size(ws).as("dl"), explode(ws).as("term")).count()
      }
      time("explode+groupBy2") {
        d.select(col("doc_id"), explode(ws).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1))).count()
      }
      time("explode+size+groupBy3") {
        d.select(col("doc_id"), size(ws).as("dl"), explode(ws).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1))).count()
      }
      time("postings()") {
        graft.ops.Retrieval.postings(d, "doc_id", "text").count()
      }
      time("groupBy3-cheapdl") {
        d.select(col("doc_id"), length(col("text")).as("dl"), explode(ws).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1))).count()
      }
      if (rep == 2) {
        d.select(col("doc_id"), size(ws).as("dl"), explode(ws).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)))
          .explain("formatted")
      }
    }
    spark.stop()
  }
}
