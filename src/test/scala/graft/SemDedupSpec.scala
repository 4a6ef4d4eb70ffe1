package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two tight clusters on orthogonal axes; labels match the cluster so the
  // label-mean centroids separate them. Within cluster A, vectors 1 and 2
  // are near-identical (cos ~ 1); vector 5 in cluster B is alone.
  private def vecs = Seq(
    (1L, Array(1.0f, 0.01f, 0f, 0f), 0),
    (2L, Array(1.0f, 0.02f, 0f, 0f), 0),
    (3L, Array(0.9f, -0.4f, 0f, 0f), 0), // same cell, low cos to 1/2
    (5L, Array(0f, 0f, 1.0f, 0.01f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("semDedupDrops keeps the lowest id per neighborhood, within cells only") {
    val drops = Similarity.semDedupDrops(vecs, minCos = 0.99).collect()
    assert(drops.length == 1)
    assert(drops.head.getLong(0) == 2L) // 1 survives as the keeper
    assert(drops.head.getDouble(2) > 0.99)
  }

  test("semDedupDrops threshold gates the drop set") {
    // at a loose threshold 3 also drops (cos(1,3) ~ 0.83); 5 never drops
    val drops = Similarity.semDedupDrops(vecs, minCos = 0.5)
      .select("vec_id").as[Long].collect().sorted
    assert(drops.toSeq == Seq(2L, 3L))
  }
}
