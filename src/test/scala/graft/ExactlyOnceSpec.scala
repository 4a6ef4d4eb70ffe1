package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

/** The committed-batchId ledger behind e12: a replayed micro-batch (same
  * batchId, same rows — Structured Streaming's redelivery contract after a
  * restart) must be a no-op, while a NEW batchId must append. Verified on
  * the store row counts, not just the boolean.
  */
class ExactlyOnceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val db = "graft_eo_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("replayed batchId is suppressed; new batchId appends; ledger survives") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    Bucketing.reset(spark, s"$db.store", new java.io.File(s"/tmp/$db/store"))
    val ledger = java.nio.file.Files
      .createTempDirectory("graft-eo-ledger").toFile
    def batch(lo: Int, hi: Int) = spark.range(lo, hi)
      .select((col("id") % 13).as("k"), col("id").as("v"))

    Bucketing.writeBucketed(batch(0, 100), s"$db.store", 4, Seq("k"))
    assert(spark.table(s"$db.store").count() === 100)

    // First delivery of batch 0 appends.
    assert(Bucketing.appendBucketedExactlyOnce(
      batch(100, 150), s"$db.store", 4, Seq("k"), ledger, 0L))
    spark.catalog.refreshTable(s"$db.store")
    assert(spark.table(s"$db.store").count() === 150)

    // Replay of batch 0 (the restart shape) is a no-op.
    assert(!Bucketing.appendBucketedExactlyOnce(
      batch(100, 150), s"$db.store", 4, Seq("k"), ledger, 0L))
    spark.catalog.refreshTable(s"$db.store")
    assert(spark.table(s"$db.store").count() === 150)

    // A new batchId appends; the old marker still guards batch 0.
    assert(Bucketing.appendBucketedExactlyOnce(
      batch(150, 160), s"$db.store", 4, Seq("k"), ledger, 1L))
    assert(!Bucketing.appendBucketedExactlyOnce(
      batch(100, 150), s"$db.store", 4, Seq("k"), ledger, 0L))
    spark.catalog.refreshTable(s"$db.store")
    assert(spark.table(s"$db.store").count() === 160)

    assert(Bucketing.isCommitted(ledger, 0L) && Bucketing.isCommitted(ledger, 1L))
    assert(!Bucketing.isCommitted(ledger, 2L))
  }

  test("pruneLedger drops only markers below the horizon") {
    val ledger = java.nio.file.Files
      .createTempDirectory("graft-eo-prune").toFile
    (0L to 5L).foreach(Bucketing.commit(ledger, _, "t"))
    Bucketing.pruneLedger(ledger, upToBatchId = 4L)
    assert((0L to 3L).forall(!Bucketing.isCommitted(ledger, _)))
    assert(Bucketing.isCommitted(ledger, 4L) && Bucketing.isCommitted(ledger, 5L))
  }
}
