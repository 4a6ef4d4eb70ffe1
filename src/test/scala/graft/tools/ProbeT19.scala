package graft.tools

/** Throwaway probe: why does t19's plan carry 4 BNLJ nodes? */
object ProbeT19 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local("8")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("t19_ppl_buckets")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("Scan"))
      .mkString("\n"))
    spark.stop()
  }
}
