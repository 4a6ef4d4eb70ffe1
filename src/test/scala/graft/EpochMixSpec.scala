package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Split

/** Data-constrained epoch allocation (o20): exact-integer apportionment,
  * the repetition cap, and the budget conservation invariant.
  */
class EpochMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("epochMix matches brute force: cap binds small domains, big ones subsample") {
    // per-domain token masses: a=40, b=5, c=400, d=6 → total 451;
    // K = 3×451 = 1353; uniform desired = 338 each, +1 to the first
    // domain by name (1353 % 4 = 1) → a gets 339.
    val df = Seq(("a", 10L), ("a", 30L), ("b", 5L), ("c", 400L), ("d", 6L))
      .toDF("dom", "tok")
    val got = Split.epochMix(df, "dom", "tok",
        budgetNum = 3, budgetDen = 1, capEpochs = 4)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // (n_tok, desired, emitted, epochs_e6, unmet)
    assert(got("a") === ((40L, 339L, 160L, 4000000L, 179L)))
    assert(got("b") === ((5L, 338L, 20L, 4000000L, 318L)))
    assert(got("c") === ((400L, 338L, 338L, 845000L, 0L)))
    assert(got("d") === ((6L, 338L, 24L, 4000000L, 314L)))
    // conservation: Σ desired = K exactly; Σ emitted = K − Σ unmet
    assert(got.values.map(_._2).sum === 1353L)
    assert(got.values.map(_._3).sum === 1353L - got.values.map(_._5).sum)
  }

  test("epochMix with an ample cap emits every desired token") {
    val df = Seq(("a", 100L), ("b", 100L)).toDF("dom", "tok")
    val got = Split.epochMix(df, "dom", "tok",
        budgetNum = 1, budgetDen = 2, capEpochs = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(5))).toMap
    // K = 100, desired 50 each, nobody capped → epochs 0.5, unmet 0
    assert(got("a") === ((50L, 0L)))
    assert(got("b") === ((50L, 0L)))
  }
}
