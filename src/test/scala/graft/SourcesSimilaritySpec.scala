package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources
import graft.ops.Similarity
import graft.queries.Tables.FixturesDir

class SourcesSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("station-list text scan parses bracketed int lists per scene (S4)") {
    val df = Sources.stationLists(spark, s"$FixturesDir/stations")
    assert(df.count() == 13) // 12 scenes + the LO08 scene
    val lens = df.select(size($"stations")).as[Int].collect()
    assert(lens.forall(n => n >= 4 && n <= 10))
    assert(df.filter($"scene_id".startsWith("LT05")).count() == 3)
  }

  test("metadata JSON scan exposes nested groups; 2 scenes lack metadata (S3/S6)") {
    val meta = Sources.metadata(spark, s"$FixturesDir/metadatas")
    assert(meta.count() == 11)
    val aligned = Sources.alignScenes(
      Sources.scenes(spark, s"$FixturesDir/scenes/scenes.jsonl"),
      Sources.stationLists(spark, s"$FixturesDir/stations"),
      meta)
    assert(aligned.count() == 11) // 13 scenes - 2 without metadata
  }

  test("skipFirst drops exactly the minimum scene_id (reference skip_first compat)") {
    val scenes = Sources.scenes(spark, s"$FixturesDir/scenes/scenes.jsonl")
    val stations = Sources.stationLists(spark, s"$FixturesDir/stations")
    val meta = Sources.metadata(spark, s"$FixturesDir/metadatas")
    val all = Sources.alignScenes(scenes, stations, meta)
    val skipped = Sources.alignScenes(scenes, stations, meta, skipFirst = true)
    val first = scenes.agg(org.apache.spark.sql.functions.min("scene_id"))
      .head().getString(0)
    val dropped = all.select("scene_id").except(skipped.select("scene_id"))
      .collect().map(_.getString(0)).toSeq
    // the min scene may or may not survive alignment; either way nothing
    // ELSE may disappear, and the min never appears in the skipped frame
    assert(dropped.forall(_ == first))
    assert(skipped.filter($"scene_id" === first).count() == 0)
  }

  test("ground-truth CSV carries sentinel and duplicate keys (S1)") {
    val gt = Sources.groundTruths(spark, s"$FixturesDir/ground_truths.csv")
    assert(gt.filter($"air_temp" === -9999.0).count() > 0)
    val dups = gt.groupBy("utc_date", "station_id").count().filter($"count" > 1).count()
    assert(dups > 0)
  }

  test("cosine of a vector with itself is 1; orthogonal is 0") {
    val df = Seq((Seq(1.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0), Seq(0.0, 3.0, 0.0)))
      .toDF("a", "b", "c")
    val row = df.select(
      Similarity.cosine($"a", $"b").as("same"),
      Similarity.cosine($"a", $"c").as("orth")).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, 2)
      .select("rk", "c_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq(3L, 1L)) // closest first
  }

  test("sign-LSH bucket groups same-octant vectors (ANN scale path)") {
    val vecs = Seq(
      (0L, Seq(1.0f, 1.0f, 1.0f)), (1L, Seq(2.0f, 1.0f, 3.0f)),
      (2L, Seq(-1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.annBucketed(vecs, 3)
    val pairs = out.select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (1L, 0L))) // vec 2 sits alone in its bucket
  }

  test("crossCorpusNearest: per-eval argmax over the corpus, lower-id ties") {
    // Eval 0 points along x; corpus 10 and 11 are BOTH at the same angle
    // to it (identical rounded cosine) -> the tie must go to c_id 10.
    // Eval 1 points along y; corpus 12 is its clear winner. Corpus rows
    // never appear as eval_ids and vice versa.
    val evalVecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(2.0f, 2.0f)), (11L, Seq(5.0f, 5.0f)),
      (12L, Seq(0.1f, 3.0f))).toDF("vec_id", "embedding")
    val out = Similarity.crossCorpusNearest(corpus, evalVecs)
      .as[(Long, Long, Double)].collect()
      .map { case (e, n, c) => e -> ((n, c)) }.toMap
    assert(out(0L)._1 == 10L) // tie with 11 broken to the lower id
    assert(out(1L)._1 == 12L)
    assert(out.keySet == Set(0L, 1L))
  }
}
