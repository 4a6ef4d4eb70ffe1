package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Winnowing (Schleimer et al. 2003): brute-force parity, the shared-run
  * guarantee, and the plan-shape guard against re-inlining the shingle
  * kernel into the per-window lambda.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 4

  /** Reference implementation over a token list. */
  private def bruteWinnow(tokens: Seq[String]): (Int, Set[Long]) = {
    val hs = graft.functions.PolyShinglesExpr
      .shingleHashes(tokens.mkString(" "), Dedup.ShingleN)
      .toLongArray.toSeq
    val fps = (0 to hs.size - W).map(i => hs.slice(i, i + W).min).toSet
    (hs.size, fps)
  }

  private def engineFps(texts: Seq[(Long, String)]) =
    Dedup.winnowedFingerprints(texts.toDF("doc_id", "text"), W)
      .select(col("doc_id"), col("n_shingles"), col("fps"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Long](2).toSet))
      .toMap

  test("matches the brute-force reference on a hand corpus") {
    val docs = Seq(
      0L -> "the quick brown fox jumps over the lazy dog again and again",
      1L -> "colorless green ideas sleep furiously every single night indeed")
    val got = engineFps(docs)
    docs.foreach { case (id, text) =>
      val (n, fps) = bruteWinnow(text.toLowerCase.split("\\s+").toSeq)
      assert(got(id)._1 == n, s"doc $id shingle count")
      assert(got(id)._2 == fps, s"doc $id fingerprint set")
    }
  }

  test("docs below w shingles are dropped, at exactly w kept") {
    // 5 tokens -> 3 shingles < w; 6 tokens -> 4 shingles == w.
    val got = engineFps(Seq(0L -> "a b c d e", 1L -> "a b c d e f"))
    assert(!got.contains(0L) && got.contains(1L))
    assert(got(1L)._2.size == 1) // one window -> one fingerprint
  }

  test("shared run of >= w+n-1 tokens implies a shared fingerprint") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val run = Gen.listOfN(W + Dedup.ShingleN - 1, word) // 6 shared tokens
    val pad = Gen.choose(4, 10).flatMap(Gen.listOfN(_, word))
    val prop = Prop.forAll(run, pad, pad) { (shared, p1, p2) =>
      val got = engineFps(Seq(
        0L -> (p1 ++ shared).mkString(" "),
        1L -> (shared ++ p2).mkString(" ")))
      got(0L)._2.intersect(got(1L)._2).nonEmpty
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"shared-run guarantee violated: ${res.status}")
  }

  test("extraction is the native kernel — no interpreted lambdas in the plan") {
    // range-derived text: a LocalRelation would be constant-folded away.
    val src = spark.range(2).select(col("id").as("doc_id"),
      concat(lit("a b c d e f g h "), col("id")).as("text"))
    val plan = Dedup.winnowedFingerprints(src, W)
      .queryExecution.optimizedPlan
    val lambdas = plan.expressions.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.LambdaFunction => l
    })
    assert(lambdas.isEmpty,
      s"winnowing must run in the graft_winnow kernel, found lambdas:\n$plan")
    assert(plan.toString.contains("graft_winnow"),
      s"expected the graft_winnow kernel in the plan:\n$plan")
  }
}
