package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter semi-join pruning — the 100 TB join-reduction pattern made
  * explicit: build a compact Bloom filter over the (already-filtered) dim
  * side's join keys, broadcast the one-row filter to every fact-side task,
  * and drop non-matching fact rows AT THE SCAN before any shuffle. The
  * filter is false-positive-prone, so an exact semi-join verifies the
  * survivors — the result is exact; the bloom stage only shrinks what the
  * exact join must shuffle (at 1000 executors the difference between
  * shuffling the full fact table and shuffling ~selectivity x fact).
  *
  * Spark's AQE injects the same shape automatically when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` fires; this operator
  * is the library-level form — deterministic, composable, and usable where
  * the optimizer's heuristics decline (e.g. a dim side derived from a
  * non-selective-looking subquery the cost model can't see through).
  * Engine kernels: Spark's own `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions, registered as `graft_bloom_agg`
  * / `graft_might_contain` (engine/Functions.scala).
  */
object BloomPrune {

  def bloomAgg(key: Column, estItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", key, lit(estItems), lit(numBits))

  def mightContain(bloom: Column, key: Column): Column =
    call_function("graft_might_contain", bloom, key)

  /** Exact left-semi join of `fact` against `dim`'s `key`s, with a
    * broadcast Bloom prefilter ahead of the exact join's shuffle. The
    * one-row filter aggregate enters the fact plan as a SCALAR SUBQUERY
    * (`might_contain` requires a constant/subquery bloom side — exactly
    * the shape Spark's own runtime-filter injection produces): the
    * subquery runs once, broadcasts its single binary value to every
    * fact-side task, and the probe filters at the scan.
    */
  def semiJoinPruned(fact: DataFrame, dim: DataFrame, key: String,
      estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bloom = dim.agg(bloomAgg(col(key), estItems, numBits).as("_bf"))
    fact
      .filter(mightContain(bloom.scalar(), col(key)))
      .join(dim.select(key).distinct(), Seq(key), "left_semi")
  }
}
