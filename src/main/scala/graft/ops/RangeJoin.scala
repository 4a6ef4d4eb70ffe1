package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins done as keyed joins. Spark plans a raw
  * `a.ts < b.ts AND b.ts <= a.ts + w` predicate as a broadcast-nested-loop
  * or cartesian product — O(N²) and a non-starter at 100 TB. Binning by
  * `floor(ts / w)` turns it into an equi-join on (key, bucket): each anchor
  * row probes its own bucket and the next one, every candidate lands in
  * exactly one of the two (no dedup pass needed), and the exact predicate
  * filters inside the joined bucket. Shuffle keys are (key, bucket) longs;
  * skewed buckets fall under AQE skew-join handling like any other join.
  */
object RangeJoin {

  /** Ordered pairs (a, b) with equal `keyCol` and `0 < t_b - t_a <=
    * windowMicros`. Output: k, id_a, id_b, t_a, t_b, gap_us.
    */
  def pairsWithin(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "window must be positive")
    val e = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("t"), col(idCol).as("id"))
    val a = e.select(col("k"), col("t").as("t_a"), col("id").as("id_a"))
      .withColumn("bucket",
        explode(array(floor(col("t_a") / windowMicros),
          floor(col("t_a") / windowMicros) + 1)))
    val b = e.select(col("k"), col("t").as("t_b"), col("id").as("id_b"),
      floor(col("t_b") / windowMicros).as("bucket"))
    a.join(b, Seq("k", "bucket"))
      .filter(col("t_b") > col("t_a") && col("t_b") <= col("t_a") + windowMicros)
      .select(col("k"), col("id_a"), col("id_b"), col("t_a"), col("t_b"),
        (col("t_b") - col("t_a")).as("gap_us"))
  }
}
