package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contract over the whole declared surface: nested-loop joins
  * are only ever the documented bounded broadcasts (one-row total
  * aggregates in t5/t6/t7/o1/pipeline, the bounded 20-vector query set in
  * v1, broadcast centroid assignment in v4). A new BroadcastNestedLoopJoin
  * anywhere else — or any CartesianProduct at all — is an unbounded
  * all-pairs shape that cannot survive 100 TB, and fails this suite.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // query -> max permitted BroadcastNestedLoopJoin count (absent = 0).
  private val allowedBnlj = Map(
    "o1_split_exact" -> 1,     // one-row split-point aggregate
    "pipeline_e2e" -> 2,       // o1's aggregate, twice (train + holdout)
    "t5_freq_tokens" -> 1,     // one-row token-total aggregate
    "t6_unigram_logprob" -> 1, // one-row token-total aggregate
    "t7_tfidf_top_term" -> 1,  // one-row doc-count aggregate
    "v1_cosine_topk" -> 1,     // bounded 20-vector query set (baseline)
    "v4_ivf_topk" -> 2)        // broadcast centroid table, probe + assign

  test("nested-loop joins only appear as documented bounded broadcasts") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bnlj = plan.linesIterator
          .count(_.contains("BroadcastNestedLoopJoin"))
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val cap = allowedBnlj.getOrElse(name, 0)
        (if (cart > 0) Seq(s"$name: ${cart}x CartesianProduct") else Nil) ++
          (if (bnlj > cap) Seq(s"$name: ${bnlj}x BroadcastNestedLoopJoin " +
            s"(allowed $cap)") else Nil)
    }
    assert(offenders.isEmpty,
      s"unbounded nested-loop shapes: ${offenders.mkString("; ")}")
  }
}
