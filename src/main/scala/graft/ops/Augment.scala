package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}

import graft.functions.Hashing

/** Train-set augmentation (SURVEY.md §2.5 G2/G3, §2.8 F6/F7): 4× rotation
  * fan-out with coordinate/date jitter. Reference: data_augmentation.py.
  *
  * All of it is pure Catalyst expressions — the rot90 is an index
  * permutation over the flattened 7×7 window (no UDF), the jitter replaces
  * numpy RNG with per-row LCG streams (deterministic across engines), and
  * the geodesic shift uses the closed-form WGS84 meters-per-degree series
  * instead of the reference's geopy call (column expression beats a UDF:
  * stays in whole-stage codegen).
  */
object Augment {

  val Side = 7
  val Px = Side * Side // 49

  /** G3: np.rot90 index permutation on a flattened Side×Side array,
    * 0-based source index for 0-based output index `i`:
    *  k=1 (CCW):  in[(i%7)*7 + (6 - i/7)]
    *  k=2:        in[48 - i]
    *  k=3:        in[(6 - i%7)*7 + i/7]
    * (rotate_tensor, data_augmentation.py:12-29).
    */
  def rot90SourceIdx(i: Column, k: Int): Column = k % 4 match {
    case 0 => i
    case 1 => (i % Side) * Side + (lit(Side - 1) - floor(i / Side).cast("int"))
    case 2 => lit(Px - 1) - i
    case 3 => (lit(Side - 1) - i % Side) * Side + floor(i / Side).cast("int")
  }

  /** Rotate one flattened 49-px window k quarter-turns CCW. */
  def rot90(img: Column, k: Int): Column =
    if (k % 4 == 0) img
    else transform(sequence(lit(0), lit(Px - 1)),
      i => element_at(img, rot90SourceIdx(i, k) + 1))

  /** Rotate a whole 7-band tensor (array of 49-px bands). */
  def rot90Bands(bands: Column, k: Int): Column =
    if (k % 4 == 0) bands else transform(bands, b => rot90(b, k))

  /** F6: modular date jitter (adjust_day_month_v2, data_augmentation.py:32-53):
    * day' = (day + randint(5,15)) % 30, 0→1; month' = (month + bump) % 12,
    * 0→1 where bump is 1 w.p. ~0.3. RNG replaced by per-row LCG on `key`.
    */
  def jitterDay(day: Column, key: Column, seed: Long): Column = {
    val delta = Hashing.lcg(key, seed, 11) + lit(5) // uniform {5..15}
    val d = pmod(day + delta, lit(30))
    when(d === 0, 1).otherwise(d)
  }

  def jitterMonth(month: Column, key: Column, seed: Long): Column = {
    val bump = when(Hashing.lcg(key, seed + 1, 10) < 3, 1).otherwise(0) // p≈0.3
    val m = pmod(month + bump, lit(12))
    when(m === 0, 1).otherwise(m)
  }

  /** WGS84 meters per degree of latitude at lat (degrees) — standard series
    * expansion (public geodesy formula; replaces geopy at
    * data_augmentation.py:60-66).
    */
  def metersPerDegLat(lat: Column): Column = {
    val phi = radians(lat)
    lit(111132.92) - lit(559.82) * cos(phi * 2) +
      lit(1.175) * cos(phi * 4) - lit(0.0023) * cos(phi * 6)
  }

  def metersPerDegLon(lat: Column): Column = {
    val phi = radians(lat)
    lit(111412.84) * cos(phi) - lit(93.5) * cos(phi * 3) + lit(0.118) * cos(phi * 5)
  }

  /** F7: geodesic coordinate shift — move `distM` meters in one of the four
    * diagonal directions (dirIdx ∈ 0..3, per move_randomly
    * data_augmentation.py:110-134): 0=NE, 1=SE, 2=SW, 3=NW.
    */
  def shiftLon(lon: Column, lat: Column, distM: Column, dirIdx: Column): Column = {
    val sign = when(dirIdx.isin(0, 1), 1.0).otherwise(-1.0)
    lon + sign * distM / metersPerDegLon(lat)
  }

  def shiftLat(lat: Column, distM: Column, dirIdx: Column): Column = {
    val sign = when(dirIdx.isin(0, 3), 1.0).otherwise(-1.0)
    lat + sign * distM / metersPerDegLat(lat)
  }

  /** Per-row jittered shift distance in meters: uniform-ish in [5km, maxKm]. */
  def jitterDistM(key: Column, seed: Long, maxKm: Int): Column =
    (Hashing.lcg(key, seed + 2, (maxKm - 5).toLong * 1000L) + lit(5000L)).cast("double")

  def jitterDir(key: Column, seed: Long): Column =
    Hashing.lcg(key, seed + 3, 4).cast("int")

  /** Geo/date-only 4× fan-out (no tensor column required): original (k=0) +
    * three jittered copies. Input needs `longitude`, `latitude`, `month`,
    * `day` and an integral unique key column. Emits `aug_k` ∈ 0..3.
    */
  def fanOutGeo(df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    val out = df.select(col("*"),
      explode(array((0 to 3).map(lit(_)): _*)).as("aug_k"))
    val k = col("aug_k")
    val rowKey = col(keyCol) * 4 + k
    out
      .withColumn("_lon2",
        when(k === 0, col("longitude"))
          .otherwise(shiftLon(col("longitude"), col("latitude"),
            jitterDistM(rowKey, seed, 20), jitterDir(rowKey, seed))))
      .withColumn("latitude",
        when(k === 0, col("latitude"))
          .otherwise(shiftLat(col("latitude"),
            jitterDistM(rowKey, seed, 20), jitterDir(rowKey, seed))))
      .withColumn("longitude", col("_lon2")).drop("_lon2")
      .withColumn("day",
        when(k === 0, col("day")).otherwise(jitterDay(col("day"), rowKey, seed)))
      .withColumn("month",
        when(k === 0, col("month")).otherwise(jitterMonth(col("month"), rowKey, seed)))
  }

  /** G2: 1→4 augmentation fan-out (apply_augmentations,
    * data_augmentation.py:137-239): original + rot90/180/270 copies with
    * jittered lon/lat/day/month, same label. Input must carry `bands7`
    * (array<array<double>>), `longitude`, `latitude`, `year`, `month`, `day`
    * and an integral unique `key` column. Emits `aug_k` ∈ 0..3.
    */
  def fanOut4(df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    val key = col(keyCol)
    val variants = explode(array((0 to 3).map(lit(_)): _*)).as("aug_k")
    val out = df.select(col("*"), variants)
    val k = col("aug_k")
    val rotated = out.withColumn("bands7",
      when(k === 0, col("bands7"))
        .when(k === 1, rot90Bands(col("bands7"), 1))
        .when(k === 2, rot90Bands(col("bands7"), 2))
        .otherwise(rot90Bands(col("bands7"), 3)))
    val rowKey = key * 4 + k // distinct LCG stream per variant
    rotated
      .withColumn("longitude",
        when(k === 0, col("longitude"))
          .otherwise(shiftLon(col("longitude"), col("latitude"),
            jitterDistM(rowKey, seed, 20), jitterDir(rowKey, seed))))
      .withColumn("latitude",
        when(k === 0, col("latitude"))
          .otherwise(shiftLat(col("latitude"),
            jitterDistM(rowKey, seed, 20), jitterDir(rowKey, seed))))
      .withColumn("day",
        when(k === 0, col("day")).otherwise(jitterDay(col("day"), rowKey, seed)))
      .withColumn("month",
        when(k === 0, col("month")).otherwise(jitterMonth(col("month"), rowKey, seed)))
  }
}
