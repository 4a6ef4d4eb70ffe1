package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-pt DataSource V2: short-name registration, agreement with the
  * UDF-based ingest on the real fixture tensors, and column pruning reaching
  * the reader (metadata-only scans never decode).
  */
class PtDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/repo/fixtures/tensors"

  test("reads real torch files and matches the binaryFile+UDF ingest") {
    val v2 = spark.read.format("graft-pt").load(dir)
      .select($"scene_id", $"tensor")
    val v1 = graft.io.TorchTensors.ingest(spark, dir)
    val a = v2.as[(String, Seq[Seq[Seq[Double]]])].collect().sortBy(_._1)
    val b = v1.as[(String, Seq[Seq[Seq[Double]]])].collect().sortBy(_._1)
    assert(a.length === 3)
    assert(a.toSeq === b.toSeq)
  }

  test("column pruning reaches the scan: metadata query reads no tensor") {
    val df = spark.read.format("graft-pt").load(dir)
      .select($"scene_id", $"length")
    val scan = org.apache.spark.sql.classic.GraftBridge.queryExecution(df)
      .executedPlan.collectFirst { case b: BatchScanExec => b }
    assert(scan.isDefined)
    assert(scan.get.scan.readSchema().fieldNames.toSeq === Seq("scene_id", "length"),
      s"tensor not pruned: ${scan.get.scan.description()}")
    val rows = df.collect()
    assert(rows.length === 3 && rows.forall(_.getLong(1) > 0))
  }

  test("files pack into size-bounded input partitions") {
    // 3 small fixture files fit one 128 MB budget -> a single partition.
    val df = spark.read.format("graft-pt").load(dir).select($"scene_id")
    assert(df.rdd.getNumPartitions === 1)
  }

  test("micro-batch stream ingests new tensor files incrementally") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pt_stream").toString
    def drop(id: String): Unit = {
      val tensor = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))  // 1 station, 2 bands
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, s"$id.pt"),
        graft.io.TorchTensors.encodePt(id, tensor))
    }
    drop("scene_a"); drop("scene_b")
    val q = spark.readStream.format("graft-pt").load(tmp)
      .select($"scene_id")
      .writeStream.format("memory").queryName("pt_stream_" + hashCode.abs)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val t = spark.table("pt_stream_" + hashCode.abs)
      assert(t.as[String].collect().sorted.toSeq === Seq("scene_a", "scene_b"))
      drop("scene_c")
      q.processAllAvailable()
      // Incremental: c arrives once, a/b are not re-read.
      assert(t.as[String].collect().sorted.toSeq ===
        Seq("scene_a", "scene_b", "scene_c"))
    } finally q.stop()
  }

  test("write path: roundtrip through real torch zip+pickle format") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pt_write").toString
    val full = spark.read.format("graft-pt").load(dir)
    val orig = full.select($"scene_id", $"tensor")
    full.write.format("graft-pt").mode("overwrite").save(tmp)
    // Overwrite again to exercise truncate + rename commit.
    full.write.format("graft-pt").mode("overwrite").save(tmp)
    val files = new java.io.File(tmp).list().toSeq
    assert(files.count(_.endsWith(".pt")) === 3, s"files: $files")
    assert(!files.exists(_.endsWith(".tmp")), s"uncommitted temp left: $files")
    val back = spark.read.format("graft-pt").load(tmp)
      .select($"scene_id", $"tensor")
      .as[(String, Seq[Seq[Seq[Double]]])].collect().sortBy(_._1)
    val want = orig.as[(String, Seq[Seq[Seq[Double]]])].collect().sortBy(_._1)
    assert(back.toSeq === want.toSeq)
    // And the low-level parser agrees it is a valid torch archive.
    val one = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(tmp, files.find(_.endsWith(".pt")).get))
    val t = graft.io.TorchTensors.parsePt(one)
    assert(t.storageType === "IntStorage" && t.shape.length === 4)
  }
}
