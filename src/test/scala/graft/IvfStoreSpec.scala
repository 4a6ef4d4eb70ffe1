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

  test("ivfDecontamRecall: probing every cell recovers the exact audit (recall 1.0)") {
    // With nprobe = k the indexed search is exhaustive, so the recall
    // gate MUST read 1.0 — the self-consistency anchor for v26 (a
    // tie-rule or cell-routing divergence between the indexed and exact
    // legs would show up here as recall < 1 even at full probe width).
    val corpus = vecs.filter($"vec_id" >= 10L)
    val eval = vecs.filter($"vec_id" < 10L)
    val store = java.nio.file.Files
      .createTempDirectory("graft-v26-store").toString
    val full = Similarity.ivfDecontamRecall(corpus, eval, store,
      k = 4, iters = 2, nprobe = 4)
      .as[(Int, Long, Long, Double)].collect().head
    assert(full == ((4, 10L, 10L, 1.0)), s"full-probe recall must be 1.0: $full")
    // A narrower probe can only lose hits, never invent them.
    val narrow = Similarity.ivfDecontamRecall(corpus, eval, store,
      k = 4, iters = 2, nprobe = 1)
      .as[(Int, Long, Long, Double)].collect().head
    assert(narrow._2 == 10L && narrow._3 <= full._3, s"narrow probe: $narrow")
  }
}
