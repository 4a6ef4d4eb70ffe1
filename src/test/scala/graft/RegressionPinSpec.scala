package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for closed ADVICE items whose fixes lived only in
  * code: each test reproduces the original failure setup and asserts the
  * fixed behavior, so a refactor can't silently reintroduce it.
  */
class RegressionPinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dirTag: punctuation-collapsing dirs map to DIFFERENT tags") {
    // The raw sanitizer collapses both "/sf0.1" and "/sf0_1" to "sf0_1";
    // without the digest suffix two different sf dirs would share one
    // scratch/store namespace and cross-contaminate stores between runs.
    val a = graft.queries.Tables.dirTag("/sf0.1")
    val b = graft.queries.Tables.dirTag("/sf0_1")
    assert(a != b, s"collapsed dirs must not collide: $a")
    // and the tag stays filesystem-safe
    assert(a.matches("[A-Za-z0-9_]+"), a)
  }

  test("b4 MRR divides by the ACTUAL query-batch size, not the nominal 8") {
    // 5-vector corpus (< the nominal 8-query batch): the metric's divisor
    // must be 5. Two labels; each query's nearest same-label neighbor is
    // at dense rank 1 by construction, so dense sum_rr_e6 = 5 * 1000000
    // and mrr_e6 = 5000000 div 5 = 1000000 — a nominal-8 divisor would
    // read 625000.
    val dir = java.nio.file.Files.createTempDirectory("b4small").toString
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0), (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 1), (3L, Array(0f, 0.9f, 0.1f, 0f), 1),
      (4L, Array(0.95f, 0.05f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq(
      (0L, "alpha beta gamma", "en", "web", 16L),
      (1L, "alpha beta delta", "en", "web", 16L),
      (2L, "epsilon zeta eta", "en", "web", 16L),
      (3L, "epsilon zeta theta", "en", "web", 18L),
      (4L, "alpha gamma delta", "en", "web", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("b4_retrieval_mrr")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nHit, sumRr, mrr) = out("dense")
    assert(nHit == 5L, s"all 5 queries must hit: $out")
    assert(sumRr == 5000000L, s"same-label neighbor at rank 1 each: $out")
    assert(mrr == 1000000L,
      s"divisor must be the actual batch (5), got mrr_e6 = $mrr")
  }

  test("trainSample never overflows: extreme and negative ids match BigInt math") {
    // ADVICE r15: the raw (id * 1000003) product overflows Long for
    // near-max ids — Spark wraps silently while other engines raise or go
    // negative, silently diverging the sample membership cross-engine.
    // The fixed spelling reduces mod m first; pin it against exact BigInt
    // arithmetic on the ids that used to overflow.
    val mod = 9973
    val keep = 3989
    val ids = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MinValue + 1,
      -1L, 0L, 1L, 9223372036854775000L)
    val got = ids.toDF("vec_id")
      .select(col("vec_id"),
        graft.ops.Similarity.trainSample(col("vec_id"), mod, keep).as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    ids.foreach { id =>
      val want = (((BigInt(id) mod mod) * 1000003) mod mod) < keep
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
  }

  test("standing-index fits auto-sample above the threshold, full-train below") {
    // Round 16: kmeansFit (and the v12-v18/v20 chains behind it) trains
    // on the deterministic hash sample once the corpus exceeds
    // AutoTrainThreshold rows. Build a 300-vector corpus where the
    // sampled and full models demonstrably differ; the auto fit's
    // assignments must equal the explicit kmeansSampled path and differ
    // from the full-train path. At 100 rows (under the threshold) the
    // auto fit must stay bit-identical to full-train.
    import graft.ops.Similarity
    def corpus(n: Int) = (0 until n).map { i =>
      (i.toLong, Array(((i * 37) % 101).toFloat, ((i * 53) % 89).toFloat,
        ((i * 71) % 97).toFloat))
    }.toDF("vec_id", "embedding")
    val big = corpus(300)
    val auto = Similarity.assignWithModel(big, Similarity.kmeansFit(big, 4, 2))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val sampled = Similarity.kmeansSampled(big, 4, 2,
        Similarity.SampleMod, Similarity.SampleKeep)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val full = Similarity.kmeansBroadcast(big, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(auto == sampled, "above threshold, auto fit must ride the sample")
    assert(auto != full,
      "witness corpus must separate the sampled and full models")
    val small = corpus(100)
    val autoS = Similarity.assignWithModel(small, Similarity.kmeansFit(small, 4, 2))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val fullS = Similarity.kmeansBroadcast(small, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(autoS == fullS, "at or under the threshold, auto fit = full train")
  }

  test("Bench.effectiveCores reads a physically-possible value") {
    // The weather probe must never report more parallelism than the box
    // has (or a nonsensical non-positive value) — a broken probe would
    // silently poison every round-over-round adjudication that reads it.
    val n = Runtime.getRuntime.availableProcessors()
    val ec = Bench.effectiveCores()
    assert(ec > 0.0 && ec <= n * 1.1,
      s"effectiveCores=$ec outside (0, ${n * 1.1}]")
  }

  test("Bench.median averages the two middle elements for even sizes") {
    // ADVICE r16: the upper-middle shortcut overstated the even-size
    // median noise floor that compare_bench.py doubles into the
    // regression threshold.
    assert(Bench.median(Nil) == 0.0)
    assert(Bench.median(Seq(0.3)) == 0.3)
    assert(Bench.median(Seq(0.1, 0.3, 0.2)) == 0.2)
    assert(Bench.median(Seq(0.4, 0.1, 0.2, 0.3)) == 0.25) // not 0.3
  }

  test("crossCorpusNearest: a zero-norm corpus vector never wins the argmax") {
    // ADVICE r16: cos(zero vector) = 0/0 = NaN, and Spark's max(struct)
    // orders NaN above every double — so one all-zero junk vector would
    // become every eval item's reported nearest neighbor. The guard
    // excludes zero-norm vectors on both sides before the argmax.
    val corpus = Seq(
      (100L, Array(0f, 0f, 0f)), // the junk vector
      (101L, Array(1f, 0f, 0f)),
      (102L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val eval = Seq(
      (0L, Array(0.9f, 0.1f, 0f)),
      (1L, Array(0f, 0f, 0f))) // zero-norm EVAL item: no cosine neighbor
      .toDF("vec_id", "embedding")
    val rows = graft.ops.Similarity.crossCorpusNearest(corpus, eval)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 1, s"zero-norm eval item must drop out: ${rows.toSeq}")
    val (evalId, nnId, cos) = rows.head
    assert(evalId == 0L && nnId == 101L, s"junk vector must not win: $nnId")
    assert(!cos.isNaN && cos > 0.99, s"cos must be finite: $cos")
  }
}
