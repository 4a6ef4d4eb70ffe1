package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling: image/audio/video (and the reference's `.pt`
  * tensors, data_loader.py:128-135) are opaque `binary` columns with typed
  * metadata. The Spark-side plumbing — binaryFile scan, schema, partitioning,
  * per-row decode signature, downstream feature ops — is real; the codec
  * itself is a clearly-marked DETERMINISTIC STUB (no torch/PIL/ffmpeg in
  * this environment; at deploy time swap `decodeStub` for the real codec
  * with the same `Array[Byte] => Array[Float]` signature).
  *
  * Scale design: decode is a narrow map (no shuffle); `repartition(n)` before
  * decode spreads large media files across executors; decoded features are
  * columnar Array[Float], so downstream similarity/dedup operators apply
  * unchanged.
  */
object Multimodal {

  val FeatureDim = 16

  /** DETERMINISTIC STUB codec: derives FeatureDim floats from the first
    * bytes (real impl: image decode + model forward). Pure function of the
    * bytes — reproducible across partitionings and engines.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      val b = if (i < bytes.length) bytes(i) & 0xff else 0
      out(i) = b / 255.0f
      i += 1
    }
    out
  }

  private val decodeUdf = udf(decodeStub _)

  /** Scan a directory of media blobs → (name, length, content). */
  def scanBlobs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"),
        col("content"))

  /** Ingest: decode each blob to a feature vector; partition first so the
    * decode map parallelizes over executors, not files-per-listing.
    */
  def ingest(blobs: DataFrame, partitions: Int = 32): DataFrame =
    blobs.repartition(partitions, col("name"))
      .withColumn("features", decodeUdf(col("content")))
      .drop("content")

  /** Frame-sample: every k-th element of a decoded sequence (video/audio
    * frame sampling analog) — pure Catalyst, no UDF.
    */
  def frameSample(features: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    filter(features, (_, i) => i % k === 0)

  /** "Resize" a feature vector to n by truncation/zero-pad (image resize
    * stub shape contract).
    */
  def resizeTo(features: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    slice(concat(features, array_repeat(lit(0.0f), n)), 1, n)
}
