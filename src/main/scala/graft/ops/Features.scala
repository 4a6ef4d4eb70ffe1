package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The relational core of the reference pipeline: scene→sample explode (G1),
  * positional zip-join (J3), ground-truth left join with first-match + −9999
  * fill (J1), broadcast station join (J2), scene-id date parse (P2), and the
  * sentinel/metadata filters (P3, P5). SURVEY.md §2.2–2.5.
  */
object Features {

  /** −9999.0 marks a missing ground truth (data_loader.py:72). */
  val Sentinel = -9999.0

  /** P2: `scene_id.split("_")[3]` → YYYYMMDD → (year, month, day)
    * (data_loader.py:56-59, feature_extractor.py:106-109).
    */
  def sceneDateParts(sceneId: Column): (Column, Column, Column) = {
    val d = split(sceneId, "_").getItem(3)
    (substring(d, 1, 4).cast("int"),
     substring(d, 5, 2).cast("int"),
     substring(d, 7, 2).cast("int"))
  }

  def withSceneDate(df: DataFrame, sceneId: String = "scene_id"): DataFrame = {
    val (y, m, dd) = sceneDateParts(col(sceneId))
    df.withColumn("year", y).withColumn("month", m).withColumn("day", dd)
  }

  /** First-match dedup of the ground-truth side (J1 prep): the reference
    * takes `air_temp.iloc[0]` of the probe result (data_loader.py:69-70), i.e.
    * the first row in frame order. Deterministic Spark equivalent: min row
    * position per key via a window — done BEFORE the join so the join side is
    * key-unique (no row explosion, and AQE can broadcast it).
    */
  def firstMatchGroundTruths(gt: DataFrame): DataFrame = {
    val w = Window.partitionBy("utc_date", "station_id").orderBy(col("gt_pos"))
    gt.withColumn("gt_pos", monotonically_increasing_id())
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "gt_pos")
  }

  /** G1+J3: scene → per-(scene, station) sample rows. `posexplode` keeps the
    * station's position so the tensor slice stays positionally aligned
    * (feature_extractor.py:42-48 zip/enumerate).
    */
  def explodeSamples(scenes: DataFrame, stationsCol: String = "stations"): DataFrame =
    scenes.select(col("*"), posexplode(col(stationsCol)).as(Seq("station_pos", "station_id")))
      .drop(stationsCol)

  /** J1: left-outer ground-truth join + −9999 fill (data_loader.py:45-74).
    * `samples` must carry year/month/day + station_id; `gt` must already be
    * key-unique (see [[firstMatchGroundTruths]]).
    */
  def joinGroundTruth(samples: DataFrame, gtDeduped: DataFrame): DataFrame =
    samples
      .join(gtDeduped.select("year", "month", "day", "station_id", "air_temp"),
        Seq("year", "month", "day", "station_id"), "left")
      .withColumn("air_temp", coalesce(col("air_temp"), lit(Sentinel)))

  /** P3: drop sentinel ground truths (feature_extractor.py:45-46). */
  def dropSentinel(df: DataFrame, c: String = "air_temp"): DataFrame =
    df.filter(col(c) =!= Sentinel)

  /** J2: broadcast station-catalog join; inner semantics drop samples whose
    * station is not in the catalog (feature_extractor.py:98-103).
    */
  def joinStationCatalog(samples: DataFrame, catalog: DataFrame): DataFrame =
    samples.join(broadcast(catalog), samples("station_id") === catalog("id"), "inner")
      .drop("id", "name")

  /** P5: metadata-presence filter (data_processor.py:84-89,
    * feature_extractor.py:51-57) — both MTL groups must exist.
    */
  def requireMetadata(df: DataFrame, metaCol: String = "LANDSAT_METADATA_FILE"): DataFrame =
    df.filter(
      col(s"$metaCol.LEVEL1_RADIOMETRIC_RESCALING").isNotNull &&
      col(s"$metaCol.LEVEL1_THERMAL_CONSTANTS").isNotNull)
}
