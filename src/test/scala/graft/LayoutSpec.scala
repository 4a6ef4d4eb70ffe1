package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that sort-clustered layout actually skips data at the scan: the
  * same range filter over the same rows emits a fraction of the corpus from
  * the sorted copy (disjoint row-group min/max stats -> footer-time
  * skipping) and the whole corpus from a round-robin copy (every row group
  * straddles the predicate). This is the within-file complement of s9's
  * hive-partition pruning and j8's bucketed join.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(df)
    df.collect() // executes THIS queryExecution, populating its scan metrics
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    plan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("parquet bloom filter skips row groups on point lookups where min/max can't") {
    // Hash-shuffled layout: every file's min/max spans ~the full id range
    // (useless for a point lookup) and a unique id never dictionary-
    // encodes — the written bloom filter is the only skipping lever.
    val src = spark.range(100000).select(
      col("id").as("doc_id"), (col("id") % 13).as("lang"))
    val bloomDir = graft.queries.Tables.scratch("layout-spec-bloom")
    val plainDir = graft.queries.Tables.scratch("layout-spec-plain")
    src.repartition(8).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", "100000")
      .parquet(bloomDir)
    src.repartition(8).write.mode("overwrite").parquet(plainDir)

    val keys = Seq(7L, 123L, 4567L, 99999L)
    def lookup(dir: String) =
      spark.read.parquet(dir).filter(col("doc_id").isin(keys: _*))
    // correctness: both layouts return exactly the probed keys
    assert(lookup(bloomDir).select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == keys.sorted)
    val bloomScan = scanRows(lookup(bloomDir))
    val plainScan = scanRows(lookup(plainDir))
    // plain layout reads everything (no stat can exclude a row group)
    assert(plainScan == 100000L, s"expected full scan without bloom, got $plainScan")
    // bloom excludes every row group provably lacking all four keys:
    // at most 4 of the 8 files survive
    assert(bloomScan <= 50000L,
      s"bloom layout should skip most row groups, got $bloomScan")
  }

  test("range filter on sort-clustered parquet skips row groups; unsorted scans all") {
    val src = spark.range(100000).select(
      col("id").as("n_chars"), (col("id") % 13).as("lang"))
    val sortedDir = graft.queries.Tables.scratch("layout-spec-sorted")
    val unsortedDir = graft.queries.Tables.scratch("layout-spec-unsorted")
    src.repartitionByRange(8, col("n_chars")).sortWithinPartitions("n_chars")
      .write.mode("overwrite").parquet(sortedDir)
    src.repartition(8) // round-robin: every file spans the full value range
      .write.mode("overwrite").parquet(unsortedDir)

    val pred = col("n_chars") >= 90000 // top 10%
    val sortedScan = scanRows(spark.read.parquet(sortedDir).filter(pred))
    val unsortedScan = scanRows(spark.read.parquet(unsortedDir).filter(pred))

    // correctness first: both layouts return identical rows
    assert(spark.read.parquet(sortedDir).filter(pred).count() == 10000)
    assert(spark.read.parquet(unsortedDir).filter(pred).count() == 10000)
    // unsorted layout cannot skip anything
    assert(unsortedScan == 100000L,
      s"expected full scan on round-robin layout, got $unsortedScan")
    // sorted layout must skip most row groups (all files with max < cut)
    assert(sortedScan <= 25000L,
      s"sorted layout should emit a fraction of the corpus, got $sortedScan")
  }
}
