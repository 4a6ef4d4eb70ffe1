package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Exact-moment Pearson agreement (t22): the decimal moment sums must
  * reproduce a brute-force double computation exactly (the inputs are
  * small enough that Long arithmetic is itself exact), and a constant
  * signal must yield NULL, matching SQL `corr`.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val xs = Seq(1L, 2L, 3L, 4L, 5L)
  private val ys = Seq(2L, 1L, 5L, 4L, 10L)
  private val zs = Seq(30L, 10L, 70L, 41L, 200L)

  private def bruteCorrE6(a: Seq[Long], b: Seq[Long]): Long = {
    val n = a.size.toLong
    val (sx, sy) = (a.sum, b.sum)
    val sxx = a.map(v => v * v).sum
    val syy = b.map(v => v * v).sum
    val sxy = a.zip(b).map { case (u, v) => u * v }.sum
    val num = n * sxy - sx * sy
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    math.floor(num.toDouble / math.sqrt(dx.toDouble * dy.toDouble) * 1e6).toLong
  }

  test("corrPairsExact matches brute force on every pair") {
    val df = xs.indices.map(i => (xs(i), ys(i), zs(i))).toDF("x", "y", "z")
    val got = Stats.corrPairsExact(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(got(("x", "y")) === ((5L, bruteCorrE6(xs, ys))))
    assert(got(("x", "z")) === ((5L, bruteCorrE6(xs, zs))))
    assert(got(("y", "z")) === ((5L, bruteCorrE6(ys, zs))))
  }

  test("a constant signal yields NULL agreement, not a crash") {
    val df = xs.map(x => (x, 7L)).toDF("x", "c")
    val rows = Stats.corrPairsExact(df, Seq("x", "c")).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(3))
  }

  test("negative association floors below zero") {
    val a = Seq(1L, 2L, 3L)
    val b = Seq(9L, 5L, 1L)
    val df = a.zip(b).toDF("x", "y")
    val got = Stats.corrPairsExact(df, Seq("x", "y")).collect().head
    assert(got.getLong(3) === bruteCorrE6(a, b))
    assert(got.getLong(3) < 0)
  }

  private def bruteGiniE6(sizes: Seq[Long]): Long = {
    val s = sizes.sorted
    val n = s.size.toLong
    val s0 = s.sum
    val s1 = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    ((2 * s1 - (n + 1) * s0) * 1000000L) / (n * s0)
  }

  test("giniByGroup matches brute force; uniform mass is 0") {
    val df = Seq(
      ("even", 10L, 100L), ("even", 11L, 100L), ("even", 12L, 100L),
      ("skew", 20L, 1L), ("skew", 21L, 1L), ("skew", 22L, 998L),
      ("mid", 30L, 100L), ("mid", 31L, 200L), ("mid", 32L, 300L)
    ).toDF("source", "doc_id", "n_chars")
    val got = Stats.giniByGroup(df, "source", "n_chars", "doc_id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("even") == ((3L, 300L, 0L)))
    assert(got("skew") == ((3L, 1000L, bruteGiniE6(Seq(1L, 1L, 998L)))))
    assert(got("mid") == ((3L, 600L, bruteGiniE6(Seq(100L, 200L, 300L)))))
    // sanity on the reference itself: heavy concentration ≈ (n−1)/n
    assert(got("skew")._3 > 600000L && got("skew")._3 < 670000L)
  }

  test("giniByGroup fails loudly past the BIGINT envelope") {
    // rk·x sums past 4.6e12 would wrap silently in non-ANSI Spark while
    // DuckDB's HUGEINT stays exact — the in-plan assert must fire first.
    val df = Seq(("g", 1L, 2000000000000L), ("g", 2L, 2000000000000L),
      ("g", 3L, 2000000000000L)).toDF("source", "doc_id", "n_chars")
    val e = intercept[Exception] {
      Stats.giniByGroup(df, "source", "n_chars", "doc_id").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("envelope"))))
  }
}
