package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

class EditDistVerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two near-identical docs (one token differs) that shingle-collide, and
  // one unrelated doc that shares no 3-gram shingles with them.
  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")
  private def docs = Seq(
    (1L, base),
    (2L, base.replace("tok15", "tokXX")),
    (3L, (1 to 30).map(i => s"zzz$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("editDistanceVerify confirms LSH candidates within the rel bound") {
    val out = Dedup.editDistanceVerify(docs, maxRel = 0.3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L) // tok15 -> tokXX: two substituted chars
    assert(r.getDouble(3) < 0.05)
  }

  test("editDistanceVerify drops candidates beyond the bound") {
    assert(Dedup.editDistanceVerify(docs, maxRel = 0.001).count() == 0)
  }
}
