package graft
/** Prints physical-plan facts for the declared queries: scan pushdown,
  * join strategies, exchanges, codegen spans. Run: sbt "runMain graft.PlanAudit [query...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local("8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Cartesian") || l.contains("Exchange"))
        .map(_.trim.takeWhile(_ != '(')).toSeq
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: [")).flatMap(l =>
        Option(l.substring(l.indexOf("PushedFilters:")).take(80))).toSeq.distinct
      println(s"== $name")
      joins.groupBy(identity).toSeq.sortBy(_._1).foreach { case (k, v) => println(s"   ${v.size}x $k") }
      pushed.take(3).foreach(p => println(s"   $p"))
    }
    spark.stop()
  }
}
