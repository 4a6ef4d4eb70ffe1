package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomPrune

/** Bloom semi-join pruning: exactness despite the false-positive-prone
  * prefilter, and the prefilter actually sitting ahead of the exact join.
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom-pruned semi join is exactly the plain semi join") {
    val rnd = new scala.util.Random(3)
    val fact = Seq.fill(500)((rnd.nextInt(200).toLong, rnd.nextInt(1000)))
      .toDF("k", "payload")
    val dim = (0L until 200L).filter(_ % 3 == 0).toDF("k")
    // Tiny filter (64 bits for ~67 keys) forces a high FP rate — the
    // verify join must absorb every false positive.
    val got = BloomPrune.semiJoinPruned(fact, dim, "k",
      estItems = 64, numBits = 64)
      .as[(Long, Int)].collect().sorted.toSeq
    val want = fact.join(dim, Seq("k"), "left_semi")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty && got.forall(_._1 % 3 == 0))
  }

  test("the bloom probe filters ahead of the exact join in the plan") {
    val fact = (0L until 100L).toDF("k")
    val dim = (0L until 10L).toDF("k")
    val plan = BloomPrune.semiJoinPruned(fact, dim, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    val probeAt = plan.indexOf("might_contain")
    val semiAt = plan.indexOf("LeftSemi")
    assert(semiAt >= 0 && probeAt > semiAt) // probe is BELOW (after) the
    // semi join in the printed tree: the filter runs before the shuffle
  }
}
