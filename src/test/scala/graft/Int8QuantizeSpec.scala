package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Int8QuantizeExpr
import graft.ops.Similarity

/** Native one-pass int8 quantization: hand-computed codes, the all-zero
  * null contract, codegen/interpreted agreement, and equivalence with the
  * exploded-aggregate formulation it replaced.
  */
class Int8QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantizes against hand-computed codes") {
    // amax = 2.0; codes: 1.0->64 (63.5 rounds up), -2.0->-127, 0.5->32
    // (31.75 -> floor(32.25)=32), 0->0
    val df = Seq((1L, Seq(1.0, -2.0, 0.5, 0.0))).toDF("vec_id", "v")
    val got = df.select(Int8QuantizeExpr.column($"v").as("z"))
      .select($"z.qnorm2", $"z.amax").as[(Long, Double)].head()
    assert(got._1 === 64L * 64 + 127L * 127 + 32L * 32)
    assert(got._2 === 2.0)
  }

  test("all-zero and empty vectors quantize to null (no scale)") {
    val df = Seq(
      (1L, Some(Seq(0.0, 0.0))),
      (2L, Some(Seq.empty[Double])),
      (3L, Option.empty[Seq[Double]])).toDF("vec_id", "v")
    val got = df.select($"vec_id", Int8QuantizeExpr.column($"v").as("z"))
      .filter($"z".isNotNull).count()
    assert(got === 0L)
  }

  test("a null element poisons the vector to NULL (oracle propagation)") {
    // ADVICE r17: ArrayType(Double, containsNull=true) is accepted, so a
    // null slot must yield NULL (the DuckDB oracle's list_transform/amax
    // NULL propagation), never NPE or silently read 0.0.
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 0.5)),
      (2L, Seq[java.lang.Double](1.0, -2.0))).toDF("vec_id", "v")
    val summary = df.select($"vec_id", Int8QuantizeExpr.column($"v").as("z"))
      .filter($"z".isNotNull).select($"vec_id").as[Long].collect().toSeq
    assert(summary === Seq(2L))
    val codes = df.select($"vec_id",
        graft.functions.Int8CodesExpr.column($"v").as("qc"))
      .filter($"qc".isNotNull).select($"vec_id").as[Long].collect().toSeq
    assert(codes === Seq(2L))
    // interpreted path agrees with the codegen'd one
    val withNull = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Any](1.0, null, 0.5))
    assert(Int8QuantizeExpr.quantize(withNull) == null)
    assert(graft.functions.Int8CodesExpr.codes(withNull) == null)
  }

  test("interpreted eval agrees with the codegen'd DataFrame path") {
    val vec = Seq(0.3, -1.7, 2.9, 0.0, -0.4)
    // interpreted: direct nullSafeEval on catalyst ArrayData
    val interp = Int8QuantizeExpr
      .quantize(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        vec.toArray))
    // codegen: through a DataFrame projection
    val cg = Seq(Tuple1(vec)).toDF("v")
      .select(Int8QuantizeExpr.column($"v").as("z"))
      .select($"z.qnorm2", $"z.err", $"z.amax")
      .as[(Long, Double, Double)].head()
    assert(interp.getLong(0) === cg._1)
    assert(interp.getDouble(1) === cg._2)
    assert(interp.getDouble(2) === cg._3)
  }

  test("matches the exploded-aggregate formulation it replaced") {
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 20L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble() * 4 - 2).map(x => math.round(x * 1e6) / 1e6)))
    val df = vecs.toDF("vec_id", "embedding")
    val native = Similarity.quantizeInt8(df)
      .as[(Long, Long, Double, Double)].collect().toSet
    // reference: the posexplode -> amax-join -> re-aggregate shape
    val ex = df.select($"vec_id", posexplode($"embedding".cast("array<double>")).as(Seq("pos", "x")))
    val am = ex.groupBy("vec_id").agg(max(abs($"x")).as("amax"))
    val ref = ex.join(am, "vec_id")
      .filter($"amax" > 0)
      .withColumn("q", floor($"x" * 127 / $"amax" + 0.5))
      .withColumn("deq", $"q" * $"amax" / 127)
      .groupBy("vec_id")
      .agg(sum(($"q" * $"q").cast("long")).as("qnorm2"),
        round(sqrt(sum(pow($"x" - $"deq", 2))), 6).as("err"),
        round(max($"amax"), 6).as("amax"))
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(native === ref)
  }

  test("Int8CodesExpr emits the code vector the summary twin norms") {
    // Same hand case as the summary test: codes must be the vector whose
    // self-dot is the summary's qnorm2, and the all-zero vector stays
    // null in both.
    val df = Seq((1L, Seq(1.0, -2.0, 0.5, 0.0)), (2L, Seq(0.0, 0.0)))
      .toDF("vec_id", "v")
    val got = df.select($"vec_id",
        graft.functions.Int8CodesExpr.column($"v").as("qc"))
      .filter($"qc".isNotNull)
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == Map(1L -> Seq(64, -127, 32, 0)))
    // interpreted path agrees with codegen
    val interp = graft.functions.Int8CodesExpr.codes(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1.0, -2.0, 0.5, 0.0)))
    assert(interp.toIntArray().toSeq == Seq(64, -127, 32, 0))
  }

  test("sq8Search re-ranks the quantized shortlist to the exact neighbor") {
    // Clustered fixture: each vec_id's vector points along direction
    // (id % 4); the exact nearest neighbor of query q is another member
    // of its own cluster. The quantized estimate must shortlist it and
    // the exact re-rank must return it with the true rounded distance.
    val vecs = (0L until 40L).map { i =>
      val d = (i % 4).toInt
      (i, Array.tabulate(8)(j =>
        (if (j == d * 2) 10f + (i / 4).toFloat / 10f else 0.1f * j)), 0)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.sq8Search(vecs, nQueries = 4, shortlist = 5)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 4)
    got.foreach { case (q, nn, d2) =>
      assert(nn % 4 == q % 4, s"query $q matched cross-cluster $nn")
      assert(nn != q && d2 >= 0.0)
    }
    // Brute-force exact top-1 must agree: the shortlist is deep enough
    // that re-ranking recovers the true neighbor on this geometry.
    val v = vecs.select($"vec_id", $"embedding".cast("array<double>").as("dv"))
    val exact = v.as("a").crossJoin(v.as("b"))
      .filter($"a.vec_id" < 4 && $"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("q_id"), $"b.vec_id".as("c_id"),
        round(expr("graft_dot(a.dv, a.dv) + graft_dot(b.dv, b.dv)" +
          " - 2 * graft_dot(a.dv, b.dv)"), 6).as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy($"d2", $"c_id")))
      .filter($"rk" === 1)
      .select($"q_id", $"c_id", $"d2")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.toSet == exact, s"sq8 ${got.toSet} != exact $exact")
  }
}
