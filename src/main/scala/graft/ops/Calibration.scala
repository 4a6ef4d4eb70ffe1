package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Radiometric calibration (SURVEY.md §2.4, M1–M6) as pure Catalyst column
  * expressions — higher-order array functions, fully codegen'd, no UDFs.
  *
  * Reference analogs: data_processor.py:54-127. Two deliberate quirks are
  * replicated from the reference *code* (not its comments):
  *  - Landsat 8/9 "brightness temperature" is `K2 / (K1 / (L + 1))` — no log,
  *    and the +1 sits inside the denominator (data_processor.py:102-108).
  *  - Landsat 5 uses the physical formula `K2 / ln(K1 / L + 1)`
  *    (data_processor.py:109-115).
  */
object Calibration {

  /** Thermal band index, 0-based: L5 band 6 at idx 5 of 7; L8/9 band 10 at
    * idx 9 of 11 (config.py:13-18).
    */
  val ThermalIdxL5 = 5
  val ThermalIdxL8 = 9

  /** L8/9 11-band → L5 7-band gather order, 0-based (config.py:19):
    * np.take(tensor, [1,2,3,4,5,9,6], axis=0).
    */
  val BandMapL8: Seq[Int] = Seq(1, 2, 3, 4, 5, 9, 6)

  /** P4: band-count validation — keep exactly 7 (L5) or 11 (L8/9) bands
    * (data_processor.py:15-36; LO08's 9-band scenes are dropped).
    */
  def validBandCount(bands: Column): Column = size(bands).isin(7, 11)

  /** M6: type tag from band count (feature_extractor.py:60-70). */
  def isLandsat5(bands: Column): Column =
    when(size(bands) === 7, 1).otherwise(0)

  /** M1: affine radiance calibration over the whole scene tensor:
    * DN → DN·mult_b + add_b per band b (data_processor.py:95-99).
    * `mult`/`add` are per-band coefficient arrays aligned with `bands`.
    */
  def radiance(bands: Column, mult: Column, add: Column): Column =
    zip_with(bands, arrays_zip(mult, add), (band, ma) =>
      transform(band, px => px * ma.getField("mult") + ma.getField("add")))

  /** M2: Landsat 5 brightness temperature, BT = K2 / ln(K1/L + 1). */
  def btL5(radiance: Column, k1: Column, k2: Column): Column =
    k2 / log(k1 / radiance + lit(1.0))

  /** M3: Landsat 8/9 "brightness temperature" exactly as the reference
    * computes it: BT = K2 / (K1 / (L + 1)). Replicates code, not comment.
    */
  def btL8(radiance: Column, k1: Column, k2: Column): Column =
    k2 / (k1 / (radiance + lit(1.0)))

  /** M2/M3 applied to the thermal band of a calibrated scene tensor: returns
    * the tensor with the thermal band replaced by BT, chosen by sensor.
    */
  def withBrightnessTemperature(bands: Column, isL5: Column, k1: Column, k2: Column): Column = {
    val thermalIdx = when(isL5 === 1, ThermalIdxL5).otherwise(ThermalIdxL8)
    transform(bands, (band, i) =>
      when(i === thermalIdx,
        transform(band, px => when(isL5 === 1, btL5(px, k1, k2)).otherwise(btL8(px, k1, k2))))
        .otherwise(band))
  }

  /** M4: band select/gather — maps an 11-band L8/9 tensor onto the 7-band L5
    * layout (thermal → position 5); identity for L5 (feature_extractor.py:61-63).
    */
  def gatherBands(bands: Column, isL5: Column): Column =
    when(isL5 === 1, bands)
      .otherwise(array(BandMapL8.map(i => element_at(bands, i + 1)): _*))

  /** M4 for flat per-band coefficient arrays: the reference emits the 7
    * coefficients in band-map order for L8/9 (feature_extractor.py:64-76).
    */
  def gatherCoeffs(coeffs: Column, isL5: Column): Column =
    when(isL5 === 1, slice(coeffs, 1, 7))
      .otherwise(array(BandMapL8.map(i => element_at(coeffs, i + 1)): _*))

  /** Coefficient array (length `n`) from the MTL rescaling struct's
    * string-valued fields; F3 sci-notation cast happens here.
    */
  def coeffArray(rescaling: Column, prefix: String, n: Int): Column =
    array((1 to n).map(b => rescaling.getField(s"${prefix}_BAND_$b").cast("double")): _*)

  /** M5: feature assembly — flatten(7×49 px) ++ 7 mults ++ 7 adds ++ [K2, K1]
    * ++ [is_l5] ++ [lon, lat, year, month, day] = 365 doubles
    * (feature_extractor.py:112-118; order per config.py:22-28 — K2 before K1).
    */
  def assembleFeatures(
      bands7: Column, mult7: Column, add7: Column, k1: Column, k2: Column,
      isL5: Column, lon: Column, lat: Column,
      year: Column, month: Column, day: Column): Column =
    concat(
      flatten(bands7),
      mult7, add7,
      array(k2, k1),
      array(isL5.cast("double")),
      array(lon, lat, year.cast("double"), month.cast("double"), day.cast("double")))
}
