package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Connected-components keeper assignment over the LSH candidate graph. */
class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical docs form one cluster with the min doc_id as keeper") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "an entirely different document about spark catalyst planning rules"
    val docs = Seq(
      (10L, a), (11L, a), (12L, a),   // clique -> keeper 10
      (20L, b), (21L, b),             // clique -> keeper 20
      (30L, "totally unrelated text mentioning neither animals nor engines once"))
      .toDF("doc_id", "text")
    val got = Dedup.dupClusters(docs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    assert(!got.contains(30L)) // no candidate pair -> not in the graph
  }

  test("simhashClusters resolves keepers over the hamming graph") {
    // Identical texts share a simhash exactly -> hamming 0 pairs.
    val x = "one two three four five six seven eight nine ten eleven twelve"
    val y = "completely different words about catalysts optimizers and planners"
    val docs = Seq((5L, x), (6L, x), (7L, y), (8L, y), (9L, "lone un-paired row"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashClusters(docs, maxHamming = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(6L) === got(5L) && got(8L) === got(7L))
    for ((keeper, members) <- got.groupBy(_._2).view.mapValues(_.keys.toSet))
      assert(keeper === members.min)
  }

  test("connectedComponents matches union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(60 + rnd.nextInt(60))(
        (rnd.nextInt(35).toLong, rnd.nextInt(35).toLong)).filter(p => p._1 != p._2)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = verts.map(v => v -> find(v)).toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("connectedComponents converges on a long path (diameter >> 1)") {
    // A 13-vertex chain needs many propagation rounds — exercises the loop
    // beyond the near-clique graphs dedup produces.
    val edges = (0L until 12L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === (0L to 12L).map(_ -> 0L).toMap)
  }

  test("star CC matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(60 + rnd.nextInt(60))(
        (rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = verts.map(v => v -> find(v)).toMap
      val got = Dedup.connectedComponentsStar(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("star CC: ScalaCheck chain graphs converge in <= log2(n) + c rounds") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Chain 0-1-2-…-n is the adversarial diameter-n case that degrades
    // min-label propagation to O(n) rounds; large-star/small-star must
    // finish in O(log n). The constant allows for the final no-op
    // fixpoint-confirmation round.
    val prop = Prop.forAll(Gen.choose(2, 400)) { n =>
      val edges = (0L until n.toLong).map(i => (i, i + 1))
      val (labels, rounds) =
        Dedup.connectedComponentsStarRounds(edges.toDF("doc_a", "doc_b"))
      val got = labels.as[(Long, Long)].collect().toMap
      val bound = (math.log(n + 1.0) / math.log(2.0)).ceil.toInt + 3
      got == (0L to n.toLong).map(_ -> 0L).toMap && rounds <= bound
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("star CC handles duplicate, reversed, and self-loop input pairs") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L))
    val got = Dedup.connectedComponentsStar(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("propagation crosses chains: a~b and b~c puts a,c in one component") {
    // Force a chain via near-identical texts sharing most shingles.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base),
      (2L, base),                       // 1~2 identical
      (3L, base + " nu"),               // shares shingles with 1/2
      (4L, base + " nu"))               // identical to 3
      .toDF("doc_id", "text")
    val got = Dedup.dupClusters(docs).as[(Long, Long)].collect().toMap
    // However LSH banded the chain, every doc in the same component maps to
    // the same keeper, and keepers are component minima.
    val comps = got.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    for ((keeper, members) <- comps) assert(keeper === members.min)
    assert(got(2L) === got(1L))
    if (got.contains(3L) && got.contains(4L)) assert(got(4L) === got(3L))
  }

  test("keepBest selects the highest score per cluster, ties to min doc_id") {
    val clusters = Seq( // two clusters as a (doc_id, keep_id) map
      (10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L))
      .toDF("doc_id", "keep_id")
    val docs = Seq( // scores: cluster 10 has a unique max; cluster 20 ties
      (10L, 5L), (11L, 9L), (12L, 7L),
      (20L, 4L), (21L, 4L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.keepBest(docs, clusters,
        org.apache.spark.sql.functions.col("n_chars"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (c, d, s, n) => c -> ((d, s, n)) }.toMap
    assert(got(10L) === ((11L, 9L, 3L))) // max score wins
    assert(got(20L) === ((20L, 4L, 2L))) // tie -> lowest doc_id
  }
}
