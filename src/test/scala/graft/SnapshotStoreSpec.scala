package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapshotStore

/** Manifest-pinned versioned store: snapshot isolation (a pinned version
  * never changes under later commits), atomic multi-file publish, orphan
  * vacuum, empty-commit degeneracy.
  */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("snapspec").toString + "/store"

  test("two commits, two versions; v1 read is untouched by the v2 commit") {
    val dir = freshDir()
    val v1 = SnapshotStore.commit(
      spark.range(10).select(col("id")).repartition(3), dir)
    assert(v1 == 1 && SnapshotStore.currentVersion(dir) == 1)
    val v1Before = SnapshotStore.readVersion(spark, dir, 1)
      .as[Long].collect().sorted.toSeq
    val v2 = SnapshotStore.commit(
      spark.range(10, 25).select(col("id")).repartition(2), dir)
    assert(v2 == 2)
    // isolation: the pinned v1 manifest still reads exactly the old rows
    val v1After = SnapshotStore.readVersion(spark, dir, 1)
      .as[Long].collect().sorted.toSeq
    assert(v1After == v1Before && v1After == (0L until 10L))
    // v2 is cumulative and complete
    assert(SnapshotStore.readVersion(spark, dir, 2)
      .as[Long].collect().sorted.toSeq == (0L until 25L))
  }

  test("an empty commit publishes a valid version with unchanged data") {
    val dir = freshDir()
    SnapshotStore.commit(spark.range(5).select(col("id")), dir)
    val v2 = SnapshotStore.commit(
      spark.range(5).select(col("id")).filter(col("id") < 0), dir)
    assert(v2 == 2)
    assert(SnapshotStore.readVersion(spark, dir, 2)
      .as[Long].collect().sorted.toSeq == (0L until 5L))
  }

  test("vacuum reclaims crash-orphaned files but never referenced ones") {
    val dir = freshDir()
    SnapshotStore.commit(spark.range(8).select(col("id")), dir)
    // simulate a crash AFTER step-2 moves but BEFORE the manifest rename:
    // an orphan data file sits in the root unreferenced.
    val orphan = new java.io.File(dir, "v2-0-part-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    SnapshotStore.vacuum(dir)
    assert(!orphan.exists())
    assert(SnapshotStore.readVersion(spark, dir, 1)
      .as[Long].collect().sorted.toSeq == (0L until 8L))
  }

  test("vacuum below keepFrom drops old manifests and their dead files") {
    val dir = freshDir()
    SnapshotStore.commit(spark.range(4).select(col("id")), dir)
    SnapshotStore.commit(spark.range(4, 9).select(col("id")), dir)
    SnapshotStore.vacuum(dir, keepFrom = 2)
    // v1's manifest is gone; its files survive because v2 references them
    intercept[IllegalArgumentException](SnapshotStore.files(dir, 1))
    assert(SnapshotStore.readVersion(spark, dir, 2)
      .as[Long].collect().sorted.toSeq == (0L until 9L))
  }
}
