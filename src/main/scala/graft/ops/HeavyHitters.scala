package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BOUNDED-STATE heavy hitters ACROSS micro-batches — batched SpaceSaving
  * (Metwally et al. 2005): the standing sketch of the stream's most
  * frequent tokens, maintained under continuous ingest in at most `m`
  * rows. Complements `functions/FreqItemsAgg.scala` (one-shot heavy
  * hitters WITHIN a batch): here the sketch itself is the cross-batch
  * STATE, the t5 report's answer to "and tomorrow's batch?".
  *
  * State: (token, cnt, err) plus a scalar eviction `floor`, with the
  * classic guarantees for any token currently in state:
  *   true_count ≤ cnt      (a re-entering token is credited the floor,
  *                          which dominates anything it could have
  *                          accumulated while evicted)
  *   cnt − err ≤ true_count (err records exactly that credited slack)
  * and any token NOT in state has true_count ≤ floor + (its mass in the
  * current batch) — the N/m error envelope.
  *
  * Merge step (exact, deterministic, cross-engine replicable — the gate
  * hashes the SKETCH STATE itself, not just bounds): existing tokens add
  * their batch counts; entering tokens start at floor + batch count with
  * err = floor; prune to the top m by (cnt desc, token); the floor rises
  * to the largest evicted cnt. All integer arithmetic over a pinned
  * total order, so the state is bit-identical under any partitioning.
  *
  * Scale shape: the merged frame is O(m + batch vocabulary) — the prune
  * is a TakeOrderedAndProject (per-task m-row heaps), the floor update
  * one bounded one-row aggregate. The honest 100 TB variant SHARDS the
  * sketch by token hash (one independent SpaceSaving per shard, same
  * merge algebra, union of shards = the report); this driver-coordinated
  * global form is that shard's inner loop.
  */
object HeavyHitters {

  /** Fold one batch of exact (token, bc) counts into standing state
    * (token, cnt, err); returns (new state, new floor). The new state is
    * eagerly localCheckpoint'd: it outlives the batch that built it, and
    * per-batch lineage must not accumulate across a long stream (the e15
    * discipline).
    */
  def mergeSpaceSaving(state: DataFrame, floor: Long, batchCounts: DataFrame,
      m: Int): (DataFrame, Long) = {
    require(m >= 1, "mergeSpaceSaving needs m >= 1")
    val merged = state
      .join(batchCounts.select(col("token"), col("bc")), Seq("token"),
        "full_outer")
      .select(col("token"),
        when(col("cnt").isNull, lit(floor) + col("bc"))
          .otherwise(col("cnt") + coalesce(col("bc"), lit(0L))).as("cnt"),
        when(col("err").isNull, lit(floor)).otherwise(col("err")).as("err"))
      .localCheckpoint()
    val kept = merged.orderBy(col("cnt").desc, col("token")).limit(m)
      .localCheckpoint()
    val evictedMax = merged.join(kept, Seq("token"), "left_anti")
      .agg(max("cnt")).head()
    val newFloor =
      if (evictedMax.isNullAt(0)) floor
      else math.max(floor, evictedMax.getLong(0))
    (kept, newFloor)
  }
}
