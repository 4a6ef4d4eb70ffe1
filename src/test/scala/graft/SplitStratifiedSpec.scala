package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
// (shuffleOrder tests live here with the other Split surface tests)

import graft.ops.Split

/** Stratified split and per-key sampling invariants. */
class SplitStratifiedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Uneven strata: 100 "a", 10 "b", 3 "c".
  private def df = spark.range(113).select(
    col("id").as("k"),
    when(col("id") < 100, "a").when(col("id") < 110, "b").otherwise("c").as("g"))

  test("stratifiedExact keeps the ratio inside every stratum") {
    val split = Split.stratifiedExact(df, "g", "k", 0.8, seed = 3L)
    val got = split.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("is_train").as("tr"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map("a" -> (100L, 80L), "b" -> (10L, 8L), "c" -> (3L, 2L)))
    // Partition of the input: every row present exactly once.
    assert(split.count() === 113)
    assert(split.select("k").distinct().count() === 113)
  }

  test("samplePerKey: at most k per key, deterministic, subset of input") {
    val s1 = Split.samplePerKey(df, "g", "k", k = 5, seed = 9L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val s2 = Split.samplePerKey(df, "g", "k", k = 5, seed = 9L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(s1 === s2)
    val perKey = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perKey === Map("a" -> 5, "b" -> 5, "c" -> 3))
    // Different seed -> different (deterministic) choice within big strata.
    val s3 = Split.samplePerKey(df, "g", "k", k = 5, seed = 10L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(s3 !== s1)
  }

  test("shuffleOrder is a deterministic permutation, invariant to input partitioning") {
    val base = spark.range(500).select(col("id").as("k"))
    val o1 = Split.shuffleOrder(base, "k", seed = 11L)
      .select("k", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // rn is a bijection onto 1..N
    assert(o1.map(_._2).sorted === (1L to 500L))
    // it is NOT the identity order (it actually shuffles)
    assert(o1.map(_._2) !== (1L to 500L))
    // identical under a different physical partitioning
    val o2 = Split.shuffleOrder(base.repartition(7), "k", seed = 11L)
      .select("k", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(o2 === o1)
    // different seed, different permutation
    val o3 = Split.shuffleOrder(base, "k", seed = 12L)
      .select("k", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(o3 !== o1)
  }

  test("sampleExactK is the shuffleOrder prefix, without the global permutation") {
    val base = spark.range(500).select(col("id").as("k"))
    val sample = Split.sampleExactK(base, "k", k = 10, seed = 11L)
      .as[Long].collect().toSeq
    assert(sample.size == 10 && sample.distinct.size == 10)
    // Exactly the first 10 of the full seeded permutation.
    val prefix = Split.shuffleOrder(base, "k", seed = 11L)
      .filter(col("rn") <= 10).select("k").as[Long].collect().toSet
    assert(sample.toSet == prefix)
    // Partitioning-invariant and a real sample (not the id prefix).
    val again = Split.sampleExactK(base.repartition(7), "k", k = 10, seed = 11L)
      .as[Long].collect().toSeq
    assert(again == sample)
    assert(sample.toSet != (0L until 10L).toSet)
    // The plan is a bounded top-k, not a global sort+limit.
    val plan = Split.sampleExactK(base, "k", k = 10, seed = 11L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("snakeShards balances shard MASS exactly on a 2n-periodic input") {
    // Sizes 16..1 dealt boustrophedon over 4 shards: every shard gets one
    // of each mirrored pair (16+9+8+1 = 15+10+7+2 = ... = 34).
    val df = spark.range(1, 17).select(col("id").as("k"), col("id").as("sz"))
    val got = Split.snakeShards(df, "sz", "k", nShards = 4)
      .groupBy("shard").agg(sum("sz").as("mass"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got == Set((0, 34L, 4L), (1, 34L, 4L), (2, 34L, 4L), (3, 34L, 4L)))
    graft.engine.Caches.releaseAll()
    // Layout-invariant assignment, including the per-row shard map.
    val a = Split.snakeShards(df, "sz", "k", 4)
      .select("k", "shard").as[(Long, Int)].collect().toSet
    graft.engine.Caches.releaseAll()
    val b = Split.snakeShards(df.repartition(5), "sz", "k", 4)
      .select("k", "shard").as[(Long, Int)].collect().toSet
    graft.engine.Caches.releaseAll()
    assert(a == b)
    // Spot the snake itself: largest four sizes land on shards 0,1,2,3;
    // the next four reverse.
    val byK = a.toMap
    assert(Seq(16L, 15L, 14L, 13L).map(byK) == Seq(0, 1, 2, 3))
    assert(Seq(12L, 11L, 10L, 9L).map(byK) == Seq(3, 2, 1, 0))
  }

  test("shardedExport: balanced shards, lossless roundtrip, interleaved order") {
    val base = spark.range(101).select(col("id").as("k")) // 101 = 12*8 + 5
    val out = java.nio.file.Files.createTempDirectory("o12spec").toString
    val back = Split.shardedExport(base, "k", nShards = 8, seed = 11L, outDir = out)
      .select("k", "rn", "shard").as[(Long, Long, Int)].collect().toSeq
    // Lossless: the read-back export is exactly the input key set.
    assert(back.map(_._1).sorted === (0L until 101L))
    // Exact ±1 balance: 5 shards of 13, 3 of 12.
    val sizes = back.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.values.toSeq.sorted === Seq(12, 12, 12, 13, 13, 13, 13, 13))
    // Interleaved: shard s holds exactly the positions rn ≡ s+1 (mod 8).
    assert(back.forall { case (_, rn, s) => (rn - 1) % 8 == s })
    // The shard column is a real partition directory, not a data column.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === (0 until 8).map(s => s"shard=$s").toArray)
  }

  test("groupSplit never puts one group's rows in two splits") {
    val rows = (1 to 200).map(i => (i.toLong, s"src_${i % 17}"))
      .toDF("doc_id", "source")
    val got = Split.groupSplit(rows, "source", nBuckets = 10, trainBuckets = 8)
      .select("source", "split").as[(String, String)].collect()
    val perGroup = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(perGroup.values.forall(_.size == 1)) // leakage-free
    assert(got.map(_._2).toSet.subsetOf(Set("train", "test")))
    // Deterministic: a re-run assigns identically.
    val again = Split.groupSplit(rows, "source", 10, 8)
      .select("source", "split").as[(String, String)].collect()
    assert(got.sortBy(_._1.toString).toSeq == again.sortBy(_._1.toString).toSeq)
  }

  test("kFold balances every (stratum, fold) cell to +-1 and is layout-invariant") {
    val df = (1L to 103L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val folds = graft.ops.Split.kFold(df, "lang", "doc_id", k = 5, seed = 19L)
    val cells = folds.groupBy("lang", "fold").count()
      .as[(String, Int, Long)].collect()
    cells.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.map(_._2).toSet == (0 until 5).toSet)
      assert(cs.map(_._3).max - cs.map(_._3).min <= 1)
    }
    val a = folds.as[(Long, String, Int)].collect().toSet
    val b = graft.ops.Split.kFold(df.repartition(7, col("doc_id")),
      "lang", "doc_id", k = 5, seed = 19L)
      .as[(Long, String, Int)].collect().toSet
    assert(a == b)
  }
}
