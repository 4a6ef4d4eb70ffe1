package graft.engine

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Caller-owned lifecycle for operator-internal persists.
  *
  * Several operators persist a corpus-scale intermediate that feeds two or
  * more downstream consumers inside the SAME returned plan (minhashLsh's
  * signature frame, the span-cut occurrence frame, the ANN corpus
  * projection). The operator cannot unpersist it before returning — the
  * returned DataFrame is lazy and still references the cached plan — so
  * ownership of the release belongs to the CALLER, who knows when the
  * result has been materialized. This registry makes that contract
  * explicit and auditable:
  *
  *   - operators register intermediates via [[persisted]] instead of a
  *     bare `.persist(...)`;
  *   - sweep harnesses (Verify / Bench / specs) call [[releaseAll]] after
  *     consuming each query's result — every tracked block is dropped and
  *     the registry emptied;
  *   - CacheHygieneSpec asserts the contract end-to-end: after an
  *     operator's result is materialized and released, none of its
  *     tracked RDDs remain in `sparkContext.getPersistentRDDs`.
  *
  * Self-managed loop state (connected-components' per-round frames, which
  * unpersist inside the loop) and model-sized `localCheckpoint`s (k-row
  * centroid frames, whose blocks the ContextCleaner reclaims when the
  * plan is garbage-collected) stay OUT of this registry by design.
  *
  * CONCURRENCY CONTRACT: the registry is process-global and [[releaseAll]]
  * drops EVERY tracked intermediate, so it assumes the single-threaded
  * sweep the Verify/Bench/spec harnesses run — one query materialized,
  * then released, before the next starts. Two concurrently-executing
  * queries would stay CORRECT under a cross-release (Spark recomputes an
  * unpersisted plan), but each would silently lose the reuse its persist
  * exists for. A concurrent harness should scope releases to its own
  * handles (`Caches.persisted` returns the Dataset — unpersist that)
  * rather than calling the global [[releaseAll]].
  */
object Caches {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` (MEMORY_AND_DISK — corpus-scale intermediates must be
    * spill-safe) and register it for a later caller-owned [[releaseAll]].
    */
  def persisted[T](ds: Dataset[T]): Dataset[T] = synchronized {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Number of currently-tracked intermediates (for spec assertions). */
  def trackedCount: Int = synchronized(tracked.size)

  /** Unpersist every tracked intermediate (no-op for anything a blanket
    * `catalog.clearCache()` already dropped) and empty the registry.
    * Non-blocking: block deletion proceeds asynchronously.
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Postfix syntax for [[persisted]]:
    * `frame.persistTracked()` ≡ `Caches.persisted(frame)`.
    */
  implicit class Registered[T](private val ds: Dataset[T]) extends AnyVal {
    def persistTracked(): Dataset[T] = Caches.persisted(ds)
  }
}
