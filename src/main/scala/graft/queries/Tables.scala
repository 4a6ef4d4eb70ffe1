package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Session

/** Shared helpers for the declared query surface (SparkEntry.queries). */
object Tables {
  /** Fixture inputs mirroring the reference's source formats (tools/gen_fixtures.py). */
  val FixturesDir = "/root/repo/fixtures"

  /** Fixed per-purpose scratch dir under the system temp root. Sink-side
    * queries overwrite the SAME directory every invocation (Bench runs each
    * query twice per round) instead of leaking a fresh createTempDirectory
    * per run.
    */
  def scratch(name: String): String = {
    val d = new java.io.File(new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-scratch"), name)
    d.mkdirs()
    d.getAbsolutePath
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    Session.prepare(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read nanos as long and truncate to microseconds (exactly what
    * DuckDB's reader does, so oracle timestamps agree bit-for-bit).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    Session.prepare(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
