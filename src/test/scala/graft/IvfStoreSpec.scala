package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** The persisted IVF-PQ index (v17): searching the on-disk cell-partitioned
  * store must (a) reproduce the in-memory v13 search bit-for-bit and
  * (b) actually prune — the store scan carries a dynamic-partition-pruning
  * filter on the cell key, so unprobed inverted lists are never listed.
  */
class IvfStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = (0L until 60L).map(i =>
    (i, Array.tabulate(8)(j => ((i % 7) * 8 + j).toFloat / 10f), (i % 3).toInt))
    .toDF("vec_id", "embedding", "label")

  test("store search equals the in-memory search and dynamic-prunes the scan") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-ivf-store").toString
    val onDisk = Similarity.ivfPqStoreSearch(vecs, store, k = 4, iters = 2,
      m = 2, nprobe = 2, nQueries = 5)
    val plan = onDisk.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"store scan is not dynamic-partition-pruned:\n$plan")
    val got = onDisk.as[(Long, Long, Double)].collect().toSet
    val mem = Similarity.ivfPqTop1(vecs, k = 4, iters = 2, m = 2,
      nprobe = 2, nQueries = 5).as[(Long, Long, Double)].collect().toSet
    assert(got == mem)
  }
}
