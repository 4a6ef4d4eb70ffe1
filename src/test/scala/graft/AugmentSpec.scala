package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Augment

class AugmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val img: Seq[Double] = (0 until 49).map(_.toDouble)

  private def rot(in: Seq[Double], k: Int): Seq[Double] = {
    val df = Seq(Tuple1(in)).toDF("img")
    df.select(Augment.rot90($"img", k).as("r")).head().getSeq[Double](0)
  }

  /** numpy-style rot90 (CCW) on a flattened 7×7, reference implementation. */
  private def npRot90(in: Seq[Double]): Seq[Double] = {
    val m = in.grouped(7).toSeq
    // out[r][c] = in[c][6-r]
    (0 until 7).flatMap(r => (0 until 7).map(c => m(c)(6 - r)))
  }

  test("rot90 k=1 matches np.rot90 semantics") {
    assert(rot(img, 1) == npRot90(img))
  }

  test("rot90 k=2 and k=3 equal iterated k=1") {
    assert(rot(img, 2) == npRot90(npRot90(img)))
    assert(rot(img, 3) == npRot90(npRot90(npRot90(img))))
  }

  test("four rotations are the identity (group law)") {
    assert(rot(rot(img, 1), 3) == img)
    assert(rot(rot(img, 2), 2) == img)
  }

  test("fanOutGeo produces exactly 4 variants with k=0 unchanged") {
    val base = Seq((7, 34.5, 31.2, 7, 15)).toDF("id", "longitude", "latitude", "month", "day")
    val out = Augment.fanOutGeo(base, "id", seed = 42L)
    assert(out.count() == 4)
    val orig = out.filter($"aug_k" === 0).head()
    assert(orig.getAs[Double]("longitude") == 34.5)
    assert(orig.getAs[Double]("latitude") == 31.2)
    // jittered copies move both coordinates
    val moved = out.filter($"aug_k" =!= 0)
      .select($"longitude", $"latitude").collect()
    assert(moved.forall(r => r.getDouble(0) != 34.5 && r.getDouble(1) != 31.2))
  }

  test("day jitter stays in [1, 29] and month jitter in [1, 12]") {
    val base = (1 to 200).map(i => (i, 1.0, 1.0, (i % 12) + 1, (i % 28) + 1))
      .toDF("id", "longitude", "latitude", "month", "day")
    val out = Augment.fanOutGeo(base, "id", seed = 7L)
      .select($"day".cast("int"), $"month".cast("int")).collect()
    assert(out.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 29))
    assert(out.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 12))
  }

  test("fanOut4 rotates the tensor per variant and preserves the original") {
    val bands7 = (0 until 7).map(b => (0 until 49).map(p => (b * 49 + p).toDouble))
    val base = Seq((1L, bands7, 34.5, 31.2, 7, 15))
      .toDF("key", "bands7", "longitude", "latitude", "month", "day")
    val out = Augment.fanOut4(base, "key", seed = 42L).cache()
    assert(out.count() == 4)
    val byK = out.select($"aug_k", $"bands7").collect()
      .map(r => r.getInt(0) -> r.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq)).toMap
    assert(byK(0) == bands7)                      // original untouched
    assert(byK(2).head == bands7.head.reverse)    // rot180 = reversed flatten
    assert(byK(1) != bands7 && byK(3) != bands7)
    // rot90 applied per band: k=1 then k=3 on the same band is identity
    val k1b0 = byK(1).head
    assert(rot(k1b0, 3) == bands7.head)
    out.unpersist()
  }

  test("meters-per-degree series matches direct evaluation") {
    val lat = 31.5
    val phi = math.toRadians(lat)
    val expLat = 111132.92 - 559.82 * math.cos(2 * phi) +
      1.175 * math.cos(4 * phi) - 0.0023 * math.cos(6 * phi)
    val expLon = 111412.84 * math.cos(phi) - 93.5 * math.cos(3 * phi) +
      0.118 * math.cos(5 * phi)
    val row = Seq(Tuple1(lat)).toDF("lat")
      .select(Augment.metersPerDegLat($"lat"), Augment.metersPerDegLon($"lat")).head()
    assert(math.abs(row.getDouble(0) - expLat) < 1e-9)
    assert(math.abs(row.getDouble(1) - expLon) < 1e-9)
  }
}
