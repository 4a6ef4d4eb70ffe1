package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

class ChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkFixed windows with overlap and keeps the partial tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkFixed(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(out.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
  }

  test("chunkFixed covers every token at stride == chunkSize (no overlap)") {
    val docs = Seq((7L, (1 to 9).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkFixed(docs, "doc_id", "text", chunkSize = 3, stride = 3)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getString(3)).mkString(" ") == (1 to 9).mkString(" "))
  }

  test("chunkFixed emits one chunk for short docs") {
    val docs = Seq((2L, "only three words")).toDF("doc_id", "text")
    val out = TextOps.chunkFixed(docs, "doc_id", "text", 32, 24).collect()
    assert(out.length == 1 && out.head.getInt(2) == 3)
  }
}
