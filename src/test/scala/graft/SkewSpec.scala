package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private lazy val skewed =
    ((1 to 900).map(_ => ("hot", 1)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v").repartition(8)

  test("saltedCount equals the plain groupBy count") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "k", salts = 7)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("k", "name")
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 5)
      .groupBy("k", "name").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("splitHotKeys partitions rows exactly") {
    val (hot, rest) = Skew.splitHotKeys(skewed, "k", threshold = 500)
    assert(hot.count() == 900)
    assert(rest.count() == 100)
    assert(hot.select("k").distinct().as[String].collect().toSeq == Seq("hot"))
  }
}
