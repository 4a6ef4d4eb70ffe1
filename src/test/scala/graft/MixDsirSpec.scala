package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Split, TextOps}

/** Corpus-mixing operators added in round 12: DSIR hashed importance
  * weights (target-distribution steering) and α=0.5 temperature-smoothed
  * domain quotas (exact integer apportionment).
  */
class MixDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- DSIR ----

  test("dsirLogWeights matches a brute-force computation") {
    val docsSeq = Seq(
      (1L, "alpha beta beta", true),
      (2L, "alpha gamma", true),
      (3L, "delta delta delta", false),
      (4L, "beta delta", false))
    val df = docsSeq.toDF("doc_id", "text", "tgt")
    val B = 8
    val got = TextOps.dsirLogWeights(df, "doc_id", "text", col("tgt"), B)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // brute force with the same polyhash + smoothing + rounding
    def bucket(w: String): Int = {
      val m = graft.functions.Hashing.PolyMod
      val h = w.foldLeft(0L)((a, c) => (a * graft.functions.Hashing.PolyBase + c.toLong) % m)
      (((h % B) + B) % B).toInt
    }
    val toks = docsSeq.flatMap { case (id, t, tgt) =>
      t.split("\\s+").map(w => (id, tgt, bucket(w.toLowerCase))) }
    val tt = toks.count(_._2).toLong
    val rt = toks.size.toLong
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val lr = (0 until B).map { b =>
      val tn = toks.count(t => t._2 && t._3 == b).toLong
      val rn = toks.count(_._3 == b).toLong
      b -> r9(math.log((tn + 1).toDouble / (tt + B)) -
        math.log((rn + 1).toDouble / (rt + B)))
    }.toMap
    // mirror the engine's reassociation-stable integer pinning: lr
    // snapped to e9 BIGINT per bucket, exact integer sum, 6-dp half-away
    // rounding in integers, one final division
    val lrE9 = lr.map { case (b, x) => b -> Math.round(x * 1e9) }
    docsSeq.foreach { case (id, t, _) =>
      val ws = t.split("\\s+").toSeq
      val wE9 = ws.groupBy(w => bucket(w.toLowerCase))
        .map { case (b, g) => g.size * lrE9(b) }.sum
      val e6 = if (wE9 < 0) -((-wE9 + 500) / 1000) else (wE9 + 500) / 1000
      val exp = e6.toDouble / 1e6
      assert(got(id)._1 === exp, s"doc $id")
      assert(got(id)._2 === ws.size.toLong)
    }
  }

  test("dsirLogWeights ranks target-like docs above off-target docs") {
    // target = docs about "spark sql"; raw mixes in an off-distribution slice
    val df = ((1 to 30).map(i => (i.toLong, "spark sql shuffle join plan", i <= 20)) ++
      (31 to 60).map(i => (i.toLong, "recipe butter flour sugar oven", false)))
      .toDF("doc_id", "text", "tgt")
    val w = TextOps.dsirLogWeights(df, "doc_id", "text", col("tgt"), 32)
      .as[(Long, Double, Long)].collect()
    val (inDist, offDist) = w.partition(_._1 <= 30)
    assert(inDist.map(_._2).min > offDist.map(_._2).max,
      "every in-distribution doc must outweigh every off-distribution doc")
  }

  // ---- temperature mix ----

  test("temperatureMix quotas: exact budget, caps saturate, tail up-sampled") {
    // one giant domain (900 rows) + two small ones (64, 36). √-weights
    // (30, 8, 6)·10⁶ demand MORE than the two tails hold (72 > 64,
    // 54 > 36), so both saturate and water-filling must route the surplus
    // back to the giant: quotas (300, 64, 36) — budget met EXACTLY.
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1064).map(i => (i.toLong, "mid")) ++
      (2001 to 2036).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val sel = Split.temperatureMix(df, "source", "doc_id",
      budgetNum = 2, budgetDen = 5, seed = 7L)
    val quotas = sel.groupBy("source")
      .agg(max("quota").as("q"), count(lit(1)).as("got"),
        max("n_domain").as("n"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val k = (1000L * 2) / 5
    // every domain fills its quota exactly, and quotas spend the budget
    quotas.values.foreach { case (q, got, _) => assert(q == got) }
    assert(quotas.values.map(_._1).sum == k,
      s"water-filling must spend the whole budget: $quotas")
    assert(quotas("small")._1 == 36 && quotas("mid")._1 == 64 &&
      quotas("big")._1 == 300, s"expected (300, 64, 36): $quotas")
    // α=0.5: the saturated tail contributes 100% of itself (9% of the
    // budget vs 3.6% proportional share); the giant is down-sampled
    val (qSmall, _, nSmall) = quotas("small")
    assert(qSmall.toDouble / k > nSmall.toDouble / 1000,
      s"small-domain share ${qSmall.toDouble / k} must beat proportional")
    val (qBig, _, nBig) = quotas("big")
    assert(qBig.toDouble / k < nBig.toDouble / 1000)
  }

  test("temperatureMix with no saturation: pure largest-remainder √ shares") {
    // tails large enough that no cap binds: caps (400, 100, 36), weights
    // (20, 10, 6)·10⁶, N = 536, K = 214 → bases ⌊214·(20,10,6)/36⌋ =
    // (118, 59, 35), leftover 2 → largest remainders (a, c) get +1.
    val df = ((1 to 400).map(i => (i.toLong, "a")) ++
      (1001 to 1100).map(i => (i.toLong, "b")) ++
      (2001 to 2036).map(i => (i.toLong, "c")))
      .toDF("doc_id", "source")
    val q = Split.temperatureMix(df, "source", "doc_id", 2, 5, seed = 7L)
      .groupBy("source").agg(max("quota").as("q"))
      .as[(String, Long)].collect().toMap
    assert(q == Map("a" -> 119L, "b" -> 59L, "c" -> 36L), q.toString)
  }

  test("temperatureMix selection is deterministic and layout-independent") {
    val df = ((1 to 200).map(i => (i.toLong, s"d${i % 5}"))).toDF("doc_id", "source")
    def run(p: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      Split.temperatureMix(p(df), "source", "doc_id", 1, 2, seed = 3L)
        .select("doc_id").as[Long].collect().toSet
    val a = run(identity)
    val b = run(_.repartition(13))
    assert(a == b)
  }

  test("tokenBudgetMix fills each domain's token budget best-first") {
    // two domains with token masses 900 and 100 (docs of 100/50 tokens);
    // √-weights 30:10, K = 400 tokens → budgets (300, 100) — the tail
    // saturates (√ share 100 = its whole mass). ordCol sorts ASCENDING
    // (= quality best-first when ord = −quality); ord = doc_id here, so
    // selection must be the lowest-id prefix per domain.
    val df = ((1 to 9).map(i => (i.toLong, "big", 100L, i.toDouble)) ++
      (11 to 12).map(i => (i.toLong, "small", 50L, i.toDouble)))
      .toDF("doc_id", "source", "n_tokens", "ord")
    val sel = Split.tokenBudgetMix(df, "source", "n_tokens", "ord",
      "doc_id", budgetNum = 2, budgetDen = 5)
    val bySrc = sel.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("toks"),
        max("tok_budget").as("b"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(bySrc("big") == ((3L, 300L, 300L)))
    assert(bySrc("small") == ((2L, 100L, 100L)))
    // best-first: the kept docs are exactly the lowest ids
    assert(sel.filter(col("source") === "big").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("integer sqrt in the quota path is exact (incl. perfect squares)") {
    // Exercise the fixup through the public op: a domain of n rows gets
    // s = isqrt(n·10^12); verify s² ≤ n·10^12 < (s+1)² by reconstructing
    // s from quotas on a two-domain frame where quota ratio = s ratio.
    // Direct check of the expression instead: evaluate via select.
    val xs = Seq(1L, 2L, 3L, 4L, 25L, 26L, 999L, 1000L, 1024L, 123457L)
    val df = xs.toDF("n")
    val x = col("n") * lit(1000000000000L)
    val t0 = floor(sqrt(x.cast("double"))).cast("long")
    val t1 = when(t0 * t0 > x, t0 - 1).otherwise(t0)
    val s = when((t1 + 1) * (t1 + 1) <= x, t1 + 1).otherwise(t1)
    df.select(col("n"), s.as("s")).as[(Long, Long)].collect().foreach {
      case (n, sv) =>
        val xv = BigInt(n) * BigInt(1000000000000L)
        assert(BigInt(sv) * BigInt(sv) <= xv && xv < BigInt(sv + 1) * BigInt(sv + 1),
          s"isqrt($xv) = $sv is not exact")
    }
  }

  // ---- bigram LM ----

  test("bigramXent matches a brute-force bigram model") {
    val docsSeq = Seq(
      (1L, "a b a b a"),   // repetitive: cheap transitions
      (2L, "a b c d e"),   // novel transitions throughout
      (3L, "b b b b b"),
      (4L, "x"))           // single token: no bigrams, no output row
    val df = docsSeq.toDF("doc_id", "text")
    val got = TextOps.bigramXent(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "xent_e6")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // brute force in plain Scala, same integer pinning
    val toks = docsSeq.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val bigrams = toks.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.size == 2).map(p => (id, p(0), p(1))).toSeq
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val v = toks.flatMap(_._2).distinct.size.toLong
    def lpE9(w1: String, w2: String): Long = {
      val lp = BigDecimal(math.log((c1(w1) + v).toDouble / (c2((w1, w2)) + 1)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      (lp * BigDecimal(1e9)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map(b => lpE9(b._2, b._3)).sum
      id -> (bs.size.toLong, (s / bs.size) / 1000)
    }
    assert(got == want)
    assert(!got.contains(4L))
    // repetitive text must be cheaper than all-novel text
    assert(got(1L)._2 < got(2L)._2 && got(3L)._2 < got(1L)._2)
  }
}
