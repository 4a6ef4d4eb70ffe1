package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the zero-shuffle co-located join path.
  *
  * At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling both
  * sides. Writing each table bucketed (+ sorted) by the join key makes the
  * bucket id a physical property of the data: Spark's scan reports
  * HashPartitioning(key, nBuckets), EnsureRequirements sees both children
  * already distributed, and the sort-merge join runs with NO exchange — the
  * shuffle is paid once at write time and amortized over every subsequent
  * join/aggregation on that key.
  *
  * Bucket both sides with the SAME bucket count (or integer multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`); keep
  * nBuckets ≈ cluster cores × small factor so each bucket is one task.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket keys — plans with zero
    * exchanges when bucket layouts line up.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
