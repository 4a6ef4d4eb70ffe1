package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VectorMinAgg, VectorSumAgg}
import graft.ops.Similarity

/** Single-buffer vector aggregates: element-wise sum/min semantics, ragged
  * and null inputs, cross-partition merge, and equivalence with the
  * posexplode formulation they replace.
  */
class VectorAggsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_sum sums element-wise; ragged rows pad with zero; nulls skipped") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0))),
      (1, Some(Seq(10.0, 20.0, 30.0))),
      (1, None),
      (2, Some(Seq(5.0)))).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(VectorSumAgg.column($"v".cast("array<double>")).as("s"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(got === Seq((1, Seq(11.0, 22.0, 30.0)), (2, Seq(5.0))))
  }

  test("vec_sum of an all-null group is null") {
    val df = Seq((1, Option.empty[Seq[Double]])).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(VectorSumAgg.column($"v".cast("array<double>")).as("s"))
      .select($"s").collect()
    assert(got.head.isNullAt(0))
  }

  test("vec_min takes element-wise min; ragged tails survive") {
    val df = Seq(
      (1, Seq(5L, 9L)),
      (1, Seq(7L, 2L, 4L))).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(VectorMinAgg.column($"v").as("m"))
      .as[(Int, Seq[Long])].collect().toSeq
    assert(got === Seq((1, Seq(5L, 2L, 4L))))
  }

  test("merge across many partitions matches single-partition result") {
    val df = spark.range(1000).select(
      (col("id") % 7).as("g"),
      array((col("id") % 13).cast("double"),
        (col("id") % 17).cast("double")).as("v"))
    def run(parts: Int) =
      df.repartition(parts)
        .groupBy("g").agg(VectorSumAgg.column($"v").as("s"))
        .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(run(1) === run(32))
  }

  test("centroidsAgg matches the posexplode centroids") {
    val vecs = spark.range(200).select(
      col("id").as("vec_id"),
      (col("id") % 5).as("label"),
      array((col("id") % 11).cast("float") - 5f,
        (col("id") % 23).cast("float") - 11f,
        (col("id") % 3).cast("float")).as("embedding"))
    val a = Similarity.centroids(vecs)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val b = Similarity.centroidsAgg(vecs)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("vec_min expresses minhash signature union: min of per-doc sigs") {
    val sigs = Seq(
      ("a", Seq(3L, 8L, 1L)),
      ("a", Seq(5L, 2L, 9L)),
      ("b", Seq(7L, 7L, 7L))).toDF("src", "sig")
    val got = sigs.groupBy("src").agg(VectorMinAgg.column($"sig").as("u"))
      .as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", Seq(3L, 2L, 1L)), ("b", Seq(7L, 7L, 7L))))
  }
}
