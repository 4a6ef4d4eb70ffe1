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

  test("ivfPqStoreDelete purges the range and keeps the v17 search semantics") {
    // No-op delete (empty range) + standingMin 0: the lifecycle path must
    // collapse to exactly ivfPqStoreSearch — same model, same store, same
    // probe — pinning that the delete plumbing alone never moves a result.
    val storeA = java.nio.file.Files
      .createTempDirectory("graft-v27-noop").toString
    val stageA = java.nio.file.Files
      .createTempDirectory("graft-v27-noop-stage").toString
    val noop = Similarity.ivfPqStoreDelete(vecs, storeA, stageA, k = 4,
      iters = 2, m = 2, nprobe = 2, nQueries = 5, standingMin = 0L,
      delFrom = 30L, delTo = 30L).as[(Long, Long, Double)].collect().toSet
    val plainStore = java.nio.file.Files
      .createTempDirectory("graft-v27-plain").toString
    val plain = Similarity.ivfPqStoreSearch(vecs, plainStore, k = 4,
      iters = 2, m = 2, nprobe = 2, nQueries = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(noop == plain, s"no-op delete moved the search: $noop vs $plain")
    // Real delete: ids [10, 20) must vanish from the store and from every
    // answer; the survivors' count is exact; the probe still DPP-prunes.
    val storeB = java.nio.file.Files
      .createTempDirectory("graft-v27-del").toString
    val stageB = java.nio.file.Files
      .createTempDirectory("graft-v27-del-stage").toString
    val res = Similarity.ivfPqStoreDelete(vecs, storeB, stageB, k = 4,
      iters = 2, m = 2, nprobe = 4, nQueries = 5, standingMin = 30L,
      delFrom = 10L, delTo = 20L)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"post-delete store scan is not dynamic-partition-pruned:\n$plan")
    val rows = res.as[(Long, Long, Double)].collect()
    assert(rows.length == 5)
    assert(rows.forall { case (_, nn, _) => nn < 10L || nn >= 20L },
      s"a deleted id resurfaced as a neighbor: ${rows.mkString(",")}")
    val disk = spark.read.parquet(storeB)
    assert(disk.filter($"c_id" >= 10L && $"c_id" < 20L).isEmpty,
      "deleted ids survived on disk")
    assert(disk.count() == 50L, "survivor count off after the rewrite")
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
