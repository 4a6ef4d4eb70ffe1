package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing
import graft.ops.TextOps

class HashedTfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The bucket each token actually lands in, via the SAME hash the
    * operator uses — lets the tests assert the aggregation contract
    * (tf counts, tie-break, l2) exactly without re-deriving the hash.
    */
  private def bucketsOf(tokens: Seq[String], nBuckets: Int): Map[String, Int] =
    tokens.distinct.toDF("w")
      .select(col("w"), pmod(Hashing.polyHash(col("w")), lit(nBuckets)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("single repeated token: one bucket, tf = k, l2 = k") {
    val docs = Seq((1L, "foo foo foo foo")).toDF("doc_id", "text")
    val r = TextOps.hashedTf(docs, "doc_id", "text", nBuckets = 16).collect().head
    assert(r.getAs[Long]("top_tf") == 4L)
    assert(r.getAs[Long]("n_buckets") == 1L)
    assert(r.getAs[Double]("l2") == 4.0)
    val expectedBucket = bucketsOf(Seq("foo"), 16)("foo")
    assert(r.getAs[Int]("top_bucket") == expectedBucket)
  }

  test("per-bucket tf, argmax, and l2 match a Scala-side recomputation") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    // Skewed multiplicities so the argmax is unique before tie-break.
    val toks = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(i + 1)(w) }
    val nBuckets = 4 // forces collisions: 8 distinct words, 4 buckets
    val docs = Seq((9L, toks.mkString(" "))).toDF("doc_id", "text")
    val b = bucketsOf(words, nBuckets)
    val tf = toks.groupBy(b).map { case (bk, ws) => bk -> ws.size.toLong }
    val maxTf = tf.values.max
    val expectedTop = tf.filter(_._2 == maxTf).keys.min // ties -> lower bucket
    val expectedL2 = BigDecimal(math.sqrt(tf.values.map(t => t.toDouble * t).sum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = TextOps.hashedTf(docs, "doc_id", "text", nBuckets).collect().head
    assert(r.getAs[Int]("top_bucket") == expectedTop)
    assert(r.getAs[Long]("top_tf") == maxTf)
    assert(r.getAs[Long]("n_buckets") == tf.size.toLong)
    assert(r.getAs[Double]("l2") == expectedL2)
  }

  test("vector width is fixed: n_buckets never exceeds nBuckets") {
    val docs = (1L to 5L).map(i =>
      (i, (1 to 40).map(j => s"tok${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.hashedTf(docs, "doc_id", "text", nBuckets = 8).collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("n_buckets") <= 8L))
    // 40 distinct tokens into 8 buckets: pigeonhole says the top bucket
    // holds at least ceil(40/8) = 5.
    assert(out.forall(_.getAs[Long]("top_tf") >= 5L))
  }

  test("deterministic: two runs produce identical rows") {
    val docs = Seq((1L, "a b c a b a"), (2L, "x y z")).toDF("doc_id", "text")
    def run() = TextOps.hashedTf(docs, "doc_id", "text", nBuckets = 16)
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }
}
