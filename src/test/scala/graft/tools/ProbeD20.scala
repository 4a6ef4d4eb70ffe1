package graft.tools

/** Throwaway plan probe: prints executed plans for bucketed-join queries. */
object ProbeD20 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local("8")
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("j8_bucketed_join", "d20_incremental_dedup")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.write.mode("overwrite").format("noop").save()
      println(s"===== $q")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Sort") || l.contains("Exchange") || l.contains("FileScan"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
