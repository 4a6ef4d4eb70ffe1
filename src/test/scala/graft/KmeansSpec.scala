package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmeans separates two obvious blobs from a poor init") {
    // init = vec_ids 0 and 1 — both in the left blob; Lloyd must still
    // split the blobs: round 1 assigns {2,3} to whichever init centroid is
    // nearer, the update pulls one centroid right, and the final
    // assignment is the clean 2-blob partition.
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(10f, 10f)), (3L, Array(10f, 11f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeans(vecs, k = 2, iters = 3)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out(0L) == out(1L))
    assert(out(2L) == out(3L))
    assert(out(0L) != out(2L))
  }

  test("kmeans keeps an emptied cell's previous centroid") {
    // Identical init vectors → c0 = c1 = (0,0); round 1 assigns EVERY
    // vector to cell 0 (tie → lower cell), emptying cell 1, whose (0,0)
    // centroid must carry over. It then wins the origin points back in
    // round 2 while cell 0's mean drifts right:
    //   cb1 = ((0.75,0.75), (0,0)) → cb2 = ((1.5,1.5), (0,0)).
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)),
      (2L, Array(1f, 1f)), (3L, Array(2f, 2f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeans(vecs, k = 2, iters = 2)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("kmeans init uses the k lowest ids, not ids < k") {
    // vec_ids 7/13/21/40 — a `vec_id < k` init would be EMPTY here. The
    // lowest-2 init is {7, 13} (both left blob) and Lloyd still separates.
    val vecs = Seq(
      (7L, Array(0f, 0f)), (13L, Array(0f, 1f)),
      (21L, Array(10f, 10f)), (40L, Array(10f, 11f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeans(vecs, k = 2, iters = 3)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out(7L) == out(13L) && out(21L) == out(40L) && out(7L) != out(21L))
  }

  test("kmeansBroadcast assigns bit-identically to the plan-literal path") {
    // k = 8 over 40 pseudo-random 16-dim vectors with NON-contiguous ids —
    // every (vec_id, cluster, d2) row must agree exactly: both paths share
    // the rounded-6dp distance and 9-dp mean contract, so any divergence
    // is a real codebook/order bug, not float noise.
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 40).map { i =>
      (i * 3L + 5, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val lit = Similarity.kmeans(vecs, k = 8, iters = 3)
      .as[(Long, Int, Double)].collect().toSet
    val bc = Similarity.kmeansBroadcast(vecs, k = 8, iters = 3)
      .as[(Long, Int, Double)].collect().toSet
    assert(bc == lit)
  }

  test("kmeansSampled with a full-keep sample equals kmeans") {
    // sampleKeep = sampleMod keeps every id → same init, same rounds,
    // same assignment: the sampled path must degenerate to the exact
    // full-train result (bit-identical rows, d2 included).
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map { i =>
      (i * 3L + 5, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val full = Similarity.kmeans(vecs, k = 8, iters = 3)
      .as[(Long, Int, Double)].collect().toSet
    val samp = Similarity.kmeansSampled(vecs, k = 8, iters = 3,
        sampleMod = 1, sampleKeep = 1)
      .as[(Long, Int, Double)].collect().toSet
    assert(samp == full)
  }

  test("kmeansSampled trains on the hash sample, assigns EVERY vector") {
    // sampleMod = 2, sampleKeep = 1: keep iff (id·1000003) mod 2 = 0 —
    // the odd multiplier preserves parity, so EVEN ids train. Odd ids are
    // out-of-sample yet must appear in the final assignment, routed to
    // the cell the sampled-only model puts their blob in.
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(1f, 0f)), (3L, Array(1f, 1f)),
      (10L, Array(10f, 10f)), (11L, Array(10f, 11f)),
      (12L, Array(11f, 10f)), (13L, Array(11f, 11f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansSampled(vecs, k = 2, iters = 3,
        sampleMod = 2, sampleKeep = 1)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out.keySet ==
      Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L)) // full corpus, not the sample
    assert(Set(out(0L), out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L), out(13L)).size == 1)
    assert(out(0L) != out(10L))
  }

  test("ivfTrainedTop1 probes trained cells; nprobe bounds the search") {
    // Two clean blobs; training k = 2 recovers them as cells. nprobe = 1
    // searches only the query's own blob → within-blob nearest neighbor.
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 0f)),
      (3L, Array(10f, 10f)), (4L, Array(10f, 11f)), (5L, Array(11f, 10f)))
      .toDF("vec_id", "embedding")
    val nn = Similarity.ivfTrainedTop1(vecs, k = 2, iters = 3,
        nprobe = 1, nQueries = 6)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // d2 ties inside each blob resolve to the lower candidate id.
    assert(nn == Map(0L -> 1L, 1L -> 0L, 2L -> 0L,
      3L -> 4L, 4L -> 3L, 5L -> 3L))
    // nprobe = k searches everything: same result here (blobs are far).
    val all = Similarity.ivfTrainedTop1(vecs, k = 2, iters = 3,
        nprobe = 2, nQueries = 6)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(all == nn)
  }

  test("ivfPqTop1 candidates respect the probed trained cells") {
    // Same two blobs, m = 2 subspaces over dim 2. nprobe = 1 bounds the
    // candidate set to the query's own trained cell, so every approximate
    // neighbor must come from the query's blob — the structural IVF-PQ
    // guarantee (code-level exactness is the v13 oracle's job).
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 0f)),
      (3L, Array(10f, 10f)), (4L, Array(10f, 11f)), (5L, Array(11f, 10f)))
      .toDF("vec_id", "embedding")
    val nn = Similarity.ivfPqTop1(vecs, k = 2, iters = 3, m = 2,
        nprobe = 1, nQueries = 6)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(nn.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    val blob = (id: Long) => id < 3
    nn.foreach { case (q, c) => assert(blob(q) == blob(c), s"$q -> $c") }
  }
}
