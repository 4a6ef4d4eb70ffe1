package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming exact deduplication — the incremental member of the dedup
  * family (batch exact/MinHash/SimHash live in graft.ops.Dedup): first
  * arrival per key wins, duplicates are dropped as they stream in. The
  * training-pipeline use is continuous ingest (crawl batches landing as
  * files/Kafka) where re-crawls must not re-enter the corpus.
  *
  * Scale design: state is a per-key store partitioned by the dedup key
  * (the same shuffle key the batch operator groups on). The bounded
  * variant expires keys once the event-time watermark passes them —
  * state size is then O(keys per watermark horizon), the only shape that
  * survives an unbounded stream; a duplicate arriving AFTER its
  * original has aged out of the horizon re-emits (the documented trade —
  * exact global dedup over all history is the batch operator's job).
  */
object StreamingDedup {

  /** Watermark-bounded first-per-key dedup over the given key columns.
    * Emits each key's first-arriving row once (Append mode); state for a
    * key is dropped when the watermark passes its last-seen event time.
    */
  def firstPerKeyBounded(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Unbounded-state variant: exact over all history (state grows with
    * distinct keys — only for finite replays or key spaces known small).
    */
  def firstPerKey(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys)

  /** Key-only projection of the bounded dedup — the deterministic surface
    * (WHICH row arrives first per key is partition-order-dependent; the
    * key set itself is not).
    */
  def distinctKeysBounded(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    firstPerKeyBounded(events, tsCol, watermark, keys)
      .select(keys.map(col): _*)
}
