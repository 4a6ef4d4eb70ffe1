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

  test("PackingStream: a mid-stream redelivery advances neither carry nor store") {
    // The ADVICE-r17 failure mode, driven directly on the extracted
    // kernel: Structured Streaming redelivers an in-flight micro-batch
    // with the SAME batch id after a restart. The redelivered manifest is
    // recomputed against the post-advance carry (deliberately wrong —
    // exactly what the e20 closure would do), so a ledger miss here would
    // BOTH double the boundary window's segments and shift every later
    // window by the doubled carry. The state machine must come back
    // bit-identical and the store row count must not move.
    import graft.streaming.PackingStream
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    Bucketing.reset(spark, s"$db.pack", new java.io.File(s"/tmp/$db/pack"))
    val ledger = java.nio.file.Files
      .createTempDirectory("graft-eo-pack").toFile
    import spark.implicits._
    def manifest(docs: Seq[(Long, String)], carry: Long) =
      graft.ops.Split.packManifest(docs.toDF("doc_id", "text"), "text",
        "doc_id", ctxLen = 4, offset = carry)
    val b1 = Seq(1L -> "a b c", 2L -> "d e f g")   // 7 tokens
    val b2 = Seq(3L -> "h i j", 4L -> "k l")       // 5 tokens
    Bucketing.writeBucketed(manifest(Nil, 0L), s"$db.pack", 4,
      Seq("bin_id"))

    // Batch 0 (phase base 0) appends and advances the carry by 7.
    val s1 = PackingStream.step(manifest(b1, 0L), s"$db.pack", 4, ledger,
      ledgerId = 0L, st = PackingStream.Fresh)
    assert(s1 == PackingStream.State(7L, 1L, 0L))
    // Batch 1 continues mid-window from token 7.
    val s2 = PackingStream.step(manifest(b2, s1.carry), s"$db.pack", 4,
      ledger, ledgerId = 1L, st = s1)
    assert(s2 == PackingStream.State(12L, 2L, 1L))
    spark.catalog.refreshTable(s"$db.pack")
    val rows = spark.table(s"$db.pack").count()

    // REDELIVERY of batch 1: same ledger id, manifest recomputed at the
    // (now wrong) post-advance carry. Suppressed: state unchanged, store
    // unchanged.
    val s3 = PackingStream.step(manifest(b2, s2.carry), s"$db.pack", 4,
      ledger, ledgerId = 1L, st = s2)
    assert(s3 == s2, s"redelivery mutated the state: $s3 vs $s2")
    spark.catalog.refreshTable(s"$db.pack")
    assert(spark.table(s"$db.pack").count() === rows,
      "redelivery appended rows")

    // A NEW phase reuses Spark batch id 0 — the phase base keeps the
    // ledger keys disjoint, so it must append, not be suppressed.
    val s4 = PackingStream.step(manifest(b1, s3.carry), s"$db.pack", 4,
      ledger, ledgerId = 1000000L, st = s3)
    assert(s4.nAppended == 3L && s4.carry == 19L &&
      s4.lastLedgerId == 1000000L)
  }

  test("ledger markers run through a file:// URI FileSystem (cluster-portable)") {
    // The r18 seam: store commits went through the Hadoop FS API but the
    // ledger markers were java.io.File — a driver restarted on another
    // node would lose the ledger and replay batches into the stores. This
    // drives commit/isCommitted/pruneLedger through an explicit file://
    // URI (the same resolution path hdfs:// takes), and checks the
    // java.io.File overloads address the SAME ledger.
    val dir = java.nio.file.Files.createTempDirectory("graft-eo-uri").toFile
    val uri = dir.toURI.toString
    assert(uri.startsWith("file:"), s"toURI must yield a file scheme: $uri")
    assert(!Bucketing.isCommitted(uri, 7L))
    Bucketing.commit(uri, 7L, "portable")
    assert(Bucketing.isCommitted(uri, 7L))
    assert(Bucketing.isCommitted(dir, 7L),
      "File and URI spellings must address one ledger")
    // The marker's note bytes actually reached the published file (the
    // NIO force before the rename ran against real, non-empty content —
    // an hsync that silently degraded to a no-op flush on a closed-early
    // stream would leave an empty marker here).
    val marker7 = new java.io.File(dir, "batch-7")
    assert(java.nio.file.Files.readString(marker7.toPath) == "portable",
      "published marker must hold the commit note")
    // Re-commit of the same marker is idempotent AND never unpublishes:
    // the first publication survives untouched (a delete-then-rename
    // re-commit would have a crash window with no marker on disk).
    Bucketing.commit(uri, 7L, "portable-again")
    assert(Bucketing.isCommitted(uri, 7L))
    assert(java.nio.file.Files.readString(marker7.toPath) == "portable",
      "re-commit must leave the published marker untouched")
    Bucketing.commit(dir, 9L, "via-file-overload")
    assert(Bucketing.isCommitted(uri, 9L))
    Bucketing.pruneLedger(uri, upToBatchId = 9L)
    assert(!Bucketing.isCommitted(uri, 7L) && Bucketing.isCommitted(uri, 9L))
    // No half-written temp marker may survive a completed commit.
    val leftovers = Option(dir.listFiles()).map(_.map(_.getName).toSeq)
      .getOrElse(Nil).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"commit leaked temp markers: $leftovers")
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
