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
}
