package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Mutual (reciprocal) nearest neighbors: strictly stronger than the
  * one-directional top-1 — a vector whose favorite prefers someone else
  * must not pair.
  */
class MutualNnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // One sign-bucket (all dims positive). cos(b,c) is the tightest pair;
  // a's top-1 is b, but b's top-1 is c — so a pairs with nobody.
  private def vecs = Seq(
    (1L, Array(1.0f, 0.2f)),
    (2L, Array(1.0f, 0.5f)),
    (3L, Array(1.0f, 0.52f))
  ).toDF("vec_id", "embedding")

  test("only reciprocal top-1 pairs survive, emitted once with a < b") {
    val got = Similarity.mutualNearest(vecs, nBits = 2)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    val (a, b, cos) = got.head
    assert((a, b) == ((2L, 3L)))
    assert(cos > 0.99)
  }

  test("an isolated bucket yields no pairs; two-vector buckets are always mutual") {
    // 4 and 5 share a bucket (dim2 negative) — a 2-clique is trivially
    // mutual; 6 sits alone in a third bucket.
    val more = Seq(
      (4L, Array(1.0f, -0.5f)), (5L, Array(0.9f, -0.4f)),
      (6L, Array(-1.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualNearest(more, nBits = 2)
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((4L, 5L)))
  }
}
