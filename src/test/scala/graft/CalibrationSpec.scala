package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Calibration

/** Calibration semantics vs hand-computed values (SURVEY §5: K1=607.76,
  * K2=1260.56 from real Landsat-5 metadata).
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double").as("v")).head().getDouble(0)

  test("btL5 matches the physical log formula") {
    val l = 25.0; val k1 = 607.76; val k2 = 1260.56
    val expected = k2 / math.log(k1 / l + 1.0)
    val got = eval1(Calibration.btL5(lit(l), lit(k1), lit(k2)))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("btL8 replicates the reference's no-log formula (code, not comment)") {
    val l = 25.0; val k1 = 774.8853; val k2 = 1321.0789
    // data_processor.py:102-108: K2 / (K1 / (L + 1)) — +1 inside denominator
    val expected = k2 / (k1 / (l + 1.0))
    val got = eval1(Calibration.btL8(lit(l), lit(k1), lit(k2)))
    assert(math.abs(got - expected) < 1e-12)
    // and it is NOT the physical formula
    assert(math.abs(got - k2 / math.log(k1 / l + 1.0)) > 1.0)
  }

  test("radiance is the per-band affine map") {
    val df = Seq((Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(2.0, 10.0), Seq(0.5, -1.0)))
      .toDF("bands", "mult", "add")
    val out = df.select(Calibration.radiance($"bands", $"mult", $"add").as("r"))
      .head().getSeq[scala.collection.Seq[Double]](0)
    assert(out.map(_.toSeq) == Seq(Seq(2.5, 4.5), Seq(29.0, 39.0)))
  }

  test("gatherBands maps 11-band L8 onto the 7-band layout [1,2,3,4,5,9,6]") {
    val bands11 = (0 until 11).map(i => Seq(i.toDouble))
    val df = Seq(Tuple1(bands11)).toDF("bands")
    val out = df.select(Calibration.gatherBands($"bands", lit(0)).as("g"))
      .head().getSeq[scala.collection.Seq[Double]](0)
    assert(out.map(_.head).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 9.0, 6.0))
  }

  test("L5 gather is identity; band-count validation keeps 7/11 only") {
    val bands7 = (0 until 7).map(i => Seq(i.toDouble))
    val df = Seq(Tuple1(bands7)).toDF("bands")
    val out = df.select(Calibration.gatherBands($"bands", lit(1)).as("g"))
      .head().getSeq[scala.collection.Seq[Double]](0)
    assert(out.map(_.head).toSeq == (0 until 7).map(_.toDouble))
    val counts = Seq(7, 9, 11).map { n =>
      val d = Seq(Tuple1((0 until n).map(i => Seq(i.toDouble)))).toDF("bands")
      d.filter(Calibration.validBandCount($"bands")).count()
    }
    assert(counts == Seq(1L, 0L, 1L))
  }

  test("assembleFeatures is 365 wide with [K2, K1] order") {
    val bands7 = (0 until 7).map(b => (0 until 49).map(p => (b * 49 + p).toDouble))
    val df = Seq(Tuple1(bands7)).toDF("bands7")
    val feats = df.select(Calibration.assembleFeatures(
        $"bands7",
        array((1 to 7).map(i => lit(i * 0.1)): _*),
        array((1 to 7).map(i => lit(-i * 0.2)): _*),
        lit(607.76), lit(1260.56), lit(1),
        lit(34.5), lit(31.2), lit(2006), lit(7), lit(15)).as("f"))
      .head().getSeq[Double](0)
    assert(feats.length == 365)
    assert(feats.take(343) == bands7.flatten)
    assert(feats.slice(343, 350) == (1 to 7).map(_ * 0.1))
    assert(feats.slice(350, 357) == (1 to 7).map(-_ * 0.2))
    assert(feats(357) == 1260.56 && feats(358) == 607.76) // K2 before K1
    assert(feats(359) == 1.0)
    assert(feats.slice(360, 365) == Seq(34.5, 31.2, 2006.0, 7.0, 15.0))
  }
}
