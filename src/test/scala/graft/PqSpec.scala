package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dim=4, m=2 (sub=2). Labels 0/1 sit on distinct axes so the label-mean
  // codebook is easy to reason about by hand.
  private def vecs = Seq(
    (0L, Array(1.0f, 0f, 0f, 0f), 0),
    (1L, Array(1.0f, 0f, 0f, 0f), 0),
    (2L, Array(0f, 0f, 2.0f, 0f), 1),
    (3L, Array(0f, 0f, 2.0f, 2.0f), 1)
  ).toDF("vec_id", "embedding", "label")
  // centroids: label 0 = [1,0,0,0]; label 1 = [0,0,2,1]

  test("pqEncode picks the nearest centroid per subspace with exact errors") {
    val out = Similarity.pqEncode(vecs, m = 2).orderBy("vec_id").collect()
    // vec 0: sub0 [1,0] -> label0 (d2=0); sub1 [0,0] -> label0 [0,0] d2=0 vs label1 [2,1] d2=5
    assert(out(0).getInt(1) == 0 && out(0).getInt(2) == 0)
    assert(out(0).getDouble(3) == 0.0)
    // vec 3: sub0 [0,0] -> label0 d2=1 vs label1 d2=0 -> 1? centroids sub0:
    //   l0=[1,0] d2=1; l1=[0,0] d2=0 -> code 1. sub1 [2,2]: l0=[0,0] d2=8;
    //   l1=[2,1] d2=1 -> code 1; err=sqrt(0+1)=1
    assert(out(3).getInt(1) == 1 && out(3).getInt(2) == 1)
    assert(out(3).getDouble(3) == 1.0)
  }

  test("pqEncode tie goes to the lower centroid id") {
    // vector equidistant from both centroids in every subspace
    val tie = Seq(
      (0L, Array(2.0f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    // centroids l0=[2,0,0,0], l1=[0,0,0,0]; probe [1,0,0,0]: d2=1 to both in sub0
    val probe = Seq((9L, Array(1.0f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.pqEncode(tie.union(probe), m = 2)
      .filter(col("vec_id") === 9).collect().head
    assert(out.getInt(1) == 0) // tie in sub0 -> lower id
  }

  test("pqAdcTop1 scores candidates through codes only and excludes self") {
    val out = Similarity.pqAdcTop1(vecs, m = 2, nQueries = 1)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L)
    // vec 1 has identical codes to vec 0 -> adist 0, wins over 2/3
    assert(r.getLong(1) == 1L && r.getDouble(2) == 0.0)
  }

  test("graft_pq_encode returns null on shape mismatch") {
    val bad = Seq((0L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "dv") // dim 3, m 2
      .select(graft.functions.PqExprs.encodeColumn(
        col("dv"), array(lit(1.0), lit(2.0), lit(3.0)), 2).as("z"))
    assert(bad.collect().head.isNullAt(0))
  }

  test("graft_pq_residual subtracts the selected centroid; null out of range") {
    // codebook: cell 0 = [1,2], cell 1 = [10,20]
    val cb = array(lit(1.0), lit(2.0), lit(10.0), lit(20.0))
    val df = Seq((0L, Array(11.0, 22.0))).toDF("vec_id", "dv")
    val r1 = df.select(graft.functions.PqExprs.residualColumn(
      col("dv"), cb, lit(1)).as("r")).collect().head.getSeq[Double](0)
    assert(r1 == Seq(1.0, 2.0))
    val r0 = df.select(graft.functions.PqExprs.residualColumn(
      col("dv"), cb, lit(0)).as("r")).collect().head.getSeq[Double](0)
    assert(r0 == Seq(10.0, 20.0))
    val bad = df.select(graft.functions.PqExprs.residualColumn(
      col("dv"), cb, lit(7)).as("r")).collect().head
    assert(bad.isNullAt(0))
  }

  test("ivfPqResidualRerank returns the exact neighbor when the shortlist covers the cell") {
    // With a shortlist as deep as any probed cell, the exact re-rank must
    // recover the true in-cell nearest neighbor regardless of code quality.
    val out = Similarity.ivfPqResidualRerank(vecs, k = 2, iters = 1, m = 2,
      nprobe = 2, nQueries = 1, shortlist = 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L)
    // vec 1 is identical to vec 0 -> exact d2 = 0 after re-rank
    assert(r.getLong(1) == 1L && r.getDouble(2) == 0.0)
  }
}
