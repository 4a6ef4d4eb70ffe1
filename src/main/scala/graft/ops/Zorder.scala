package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton-curve) layout: sort-cluster a table on the BIT
  * INTERLEAVING of two dimensions so parquet row-group min/max stats are
  * narrow on BOTH columns at once.
  *
  * s10's single-column sort clustering makes range predicates on that one
  * column prune at footer time — but a second dimension's values then
  * scatter across the whole file range and predicates on it prune nothing.
  * The Morton key folds both dimensions into one sort key whose contiguous
  * ranges are small axis-aligned rectangles, so a conjunctive 2-D predicate
  * (user AND time window — the "one user's day" audit query) skips row
  * groups on either or both columns. At 100 TB this is the standard lake
  * layout for multi-tenant event stores (Delta/Iceberg OPTIMIZE ZORDER);
  * here it is ~20 codegen'd bit ops and a range repartition — no engine
  * support needed.
  *
  * The z-value is a LAYOUT key only: it never appears in results, so no
  * oracle arithmetic depends on it and correctness gates purely on the
  * read-back rows matching the unlaid-out table.
  */
object Zorder {

  /** Interleave the low `bits` bits of `a` (odd positions) and `b` (even
    * positions) into a Morton key. Inputs are masked to `bits` — out-of-
    * range values wrap, which degrades clustering for those rows but never
    * correctness (the key orders the layout; filters still evaluate on the
    * real columns).
    */
  def mortonKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on (`a`, `b`): range-partition + sort within
    * partitions by the Morton key, drop the key, write parquet. Range
    * partitioning keeps files disjoint in z-ranges (the s10 discipline);
    * the within-partition sort keeps row groups tight.
    */
  def writeZordered(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int, path: String): Unit =
    df.withColumn("_z", mortonKey(a, b, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
