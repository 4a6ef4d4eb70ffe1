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

  // Reproducibility contract: the double-double accumulation makes the sum
  // independent of accumulation ORDER — bit-identical under any partition
  // layout, row order, or shuffle-merge arrival order. Plain += would make
  // the 15th digit depend on shuffle-block arrival, which downstream
  // round(…, n) calls amplify into visible result flips on rounding-tie
  // values (the e13 hash-flake class). The values below are chosen so
  // naive left-to-right vs reversed summation DO differ in the last ulp.
  test("vec_sum is bit-identical under any accumulation order") {
    val n = 2000
    // Mixed magnitudes: 1e16, many 1.x values, and tiny terms — classic
    // cancellation fodder where naive FP summation is order-dependent.
    val rows = (0 until n).map { i =>
      val x = i % 5 match {
        case 0 => 1e16
        case 1 => -1e16
        case 2 => 1.0 + i.toDouble / 1e7
        case 3 => 1e-8 * i
        case _ => math.Pi * (i + 1)
      }
      (i, Seq(x, -x / 3.0))
    }
    val df = rows.toDF("i", "v")
    def run(prep: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      prep(df).agg(VectorSumAgg.column($"v".cast("array<double>")).as("s"))
        .as[Seq[Double]].collect().head
    val a = run(identity)
    val b = run(_.repartition(32))
    val c = run(_.orderBy(desc("i")).repartition(7, col("i")))
    // doubleToRawLongBits: BIT equality, not ==-with-tolerance.
    def bits(xs: Seq[Double]) = xs.map(java.lang.Double.doubleToRawLongBits)
    assert(bits(a) == bits(b) && bits(a) == bits(c),
      s"sum depended on accumulation order: $a / $b / $c")
    // And the compensated result is the EXACT sum (computable here with
    // BigDecimal), not merely a stable wrong answer.
    val exact = rows.map(_._2).foldLeft(
      (BigDecimal(0), BigDecimal(0))) { case ((s0, s1), v) =>
      (s0 + BigDecimal(v.head), s1 + BigDecimal(v(1)))
    }
    assert(a.head == exact._1.toDouble && a(1) == exact._2.toDouble)
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
