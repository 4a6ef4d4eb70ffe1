package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

/** Proof that the bucketed-table path really joins with zero shuffles: two
  * tables bucketed by the same key, sort-merge-joined without an exchange.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val db = "graft_bucket_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("co-located join on bucketed tables plans zero shuffle exchanges") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    val facts = spark.range(10000).select(
      (col("id") % 997).as("k"), col("id").as("a"))
    val dims = spark.range(5000).select(
      (col("id") % 997).as("k"), col("id").as("b"))
    Bucketing.writeBucketed(facts, s"$db.facts", nBuckets = 8, keys = Seq("k"))
    Bucketing.writeBucketed(dims, s"$db.dims", nBuckets = 8, keys = Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force the shuffled-join path so the assertion is about bucketing,
      // not about the broadcast threshold.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, s"$db.facts", s"$db.dims", Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
      joined.write.format("noop").mode("overwrite").save()
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join should be exchange-free, found ${shuffles.size}:\n$plan")
      // And the result is still correct.
      val n = joined.agg(sum("n")).collect().head.getLong(0)
      val expected = facts.join(dims, "k").count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("sorted one-file-per-bucket scans drop the per-bucket Sort too") {
    // Depends on the tables written by the test above plus the session conf
    // spark.sql.legacy.bucketedTableScan.outputOrdering=true (Session).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, s"$db.facts", s"$db.dims", Seq("k"))
      val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
      joined.write.format("noop").mode("overwrite").save()
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.isEmpty,
        s"sorted bucketed scan should satisfy SMJ ordering, found Sorts:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("d20 incremental-dedup store side: bucket-aligned read, no Exchange/Sort") {
    val plan = SparkEntry.queries("d20_incremental_dedup")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), "store scan must be bucket-aligned")
    // Exactly ONE Sort and ONE band-key Exchange — both on the delta side;
    // the store scan feeds the join raw (its order/partitioning come from
    // the bucketed layout).
    assert(plan.linesIterator.count(_.contains("+- Sort [band")) == 1, plan)
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(band")) == 1, plan)
  }
}
