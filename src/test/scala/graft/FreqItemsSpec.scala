package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqItemsAgg

/** Frequent-items sketch: the est/err sandwich against exact counts, heavy
  * hitters surviving a vocabulary much larger than the summary, and
  * cross-partition merge.
  */
class FreqItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish stream: item i appears ~N/(i+1) times, plus a long tail of
  // singletons so the vocabulary (≈5200) far exceeds capacity (8k=80).
  private def zipfDf = {
    val heavy = (0 until 20).flatMap(i => Seq.fill(2000 / (i + 1))(s"w$i"))
    val tail = (0 until 5000).map(i => s"tail$i")
    (heavy ++ tail).toDF("w").repartition(16)
  }

  test("est/err sandwich true counts; top heavy hitters are exact") {
    val k = 10
    val got = zipfDf.agg(FreqItemsAgg.column($"w", k).as("top"))
      .select(explode($"top").as("t"))
      .select($"t.item", $"t.est", $"t.err")
      .as[(String, Long, Long)].collect()
    assert(got.length === k)
    val exact = zipfDf.groupBy("w").count().as[(String, Long)].collect().toMap
    for ((item, est, err) <- got) {
      val t = exact(item)
      assert(t <= est, s"$item: est $est below true $t")
      assert(est - err <= t, s"$item: est-err ${est - err} above true $t")
    }
    // The unambiguous heavy hitters must lead, in order.
    assert(got.take(5).map(_._1).toSeq === Seq("w0", "w1", "w2", "w3", "w4"))
  }

  test("sketch per group via groupBy") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "w")
    val got = df.groupBy("g")
      .agg(FreqItemsAgg.column($"w", 1).as("top"))
      .select($"g", element_at($"top", 1).getField("item").as("item"))
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "x", "b" -> "z"))
  }
}
