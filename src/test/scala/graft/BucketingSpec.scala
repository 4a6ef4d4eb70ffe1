package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

/** Proof that the bucketed-table path really joins with zero shuffles: two
  * tables bucketed by the same key, sort-merge-joined without an exchange.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val db = "graft_bucket_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("co-located join on bucketed tables plans zero shuffle exchanges") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    val facts = spark.range(10000).select(
      (col("id") % 997).as("k"), col("id").as("a"))
    val dims = spark.range(5000).select(
      (col("id") % 997).as("k"), col("id").as("b"))
    Bucketing.writeBucketed(facts, s"$db.facts", nBuckets = 8, keys = Seq("k"))
    Bucketing.writeBucketed(dims, s"$db.dims", nBuckets = 8, keys = Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force the shuffled-join path so the assertion is about bucketing,
      // not about the broadcast threshold.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, s"$db.facts", s"$db.dims", Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
      joined.write.format("noop").mode("overwrite").save()
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join should be exchange-free, found ${shuffles.size}:\n$plan")
      // And the result is still correct.
      val n = joined.agg(sum("n")).collect().head.getLong(0)
      val expected = facts.join(dims, "k").count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("sorted one-file-per-bucket scans drop the per-bucket Sort too") {
    // Depends on the tables written by the test above plus the session conf
    // spark.sql.legacy.bucketedTableScan.outputOrdering=true (Session).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, s"$db.facts", s"$db.dims", Seq("k"))
      val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(joined)
      joined.write.format("noop").mode("overwrite").save()
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.isEmpty,
        s"sorted bucketed scan should satisfy SMJ ordering, found Sorts:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("d20 incremental-dedup store side: bucket-aligned read, no Exchange/Sort") {
    val plan = SparkEntry.queries("d20_incremental_dedup")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), "store scan must be bucket-aligned")
    // Exactly ONE Sort and ONE band-key Exchange — both on the delta side;
    // the store scan feeds the join raw (its order/partitioning come from
    // the bucketed layout).
    assert(plan.linesIterator.count(_.contains("+- Sort [band")) == 1, plan)
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(band")) == 1, plan)
  }

  test("d21 store append equals a full rebuild and stays bucket-aligned") {
    val sf = "/root/testdata/sf0.001"
    // The d21 store name is tagged by the data dir (concurrent sweeps over
    // different dirs must not share standing stores) — derive it the same
    // way the query does.
    val d21db = "graft_sigstore_d21_" + graft.queries.Tables.dirTag(sf)
    val out = SparkEntry.queries("d21_store_append")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // Rollup parity with a from-scratch rebuild over the whole corpus: the
    // append lost, duplicated, and mis-bucketed nothing.
    val full = graft.ops.Dedup.lshBuckets(graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingleHashes(graft.queries.Tables.t(spark, sf, "documents"))))
      .groupBy("band").agg(count(lit(1)).as("n_rows"),
        countDistinct("doc_id").as("n_docs"), sum("band_key").as("sum_keys"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == full)
    // A probe against the APPENDED store still plans bucket-aligned: no
    // Exchange on the store side (the one band Exchange is the probe's).
    // The sorted-scan ordering IS forfeited until compaction — with >1
    // file per bucket the store side legitimately re-sorts, so unlike the
    // d20 gate this asserts Exchange count only.
    val probe = graft.ops.Dedup.lshBuckets(graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingleHashes(graft.queries.Tables.t(spark, sf, "documents")
          .filter(col("doc_id") < 10))))
      .withColumnRenamed("doc_id", "doc_new")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force the shuffled path (at real store scale broadcast is off the
      // table anyway) so the assertion exercises bucket alignment.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = spark.table(s"$d21db.sig_bkt")
        .join(probe, Seq("band", "band_key"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert(plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(band")) == 1, plan)
      // With >1 file per bucket the store side re-sorts (2 Sorts: store +
      // probe) — the cost the append deferred. ("- Sort" matches both the
      // ":-" first-child and "+-" last-child tree prefixes.)
      assert(plan.linesIterator.count(_.contains("- Sort [band")) == 2, plan)

      // Compaction closes the lifecycle: rewriting the appended store with
      // writeBucketed restores one-file-per-bucket, so the probe join
      // reclaims the Sort-free store scan the fresh build had.
      Bucketing.reset(spark, s"$d21db.sig_cmp",
        new java.io.File(graft.queries.Tables.scratch(d21db + "_db"), "sig_cmp"))
      Bucketing.compactBucketed(spark,
        new java.io.File(graft.queries.Tables.scratch(d21db + "_db"), "sig_bkt").toString,
        s"$d21db.sig_cmp", nBuckets = 8, keys = Seq("band", "band_key"))
      assert(spark.table(s"$d21db.sig_cmp").count() ==
        spark.table(s"$d21db.sig_bkt").count())
      val compacted = spark.table(s"$d21db.sig_cmp")
        .join(probe, Seq("band", "band_key"))
        .queryExecution.executedPlan.toString
      assert(compacted.contains("Bucketed: true"), compacted.take(2000))
      assert(compacted.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(band")) == 1, compacted)
      // Store side Sort-free again: the only band Sort left is the probe's.
      assert(compacted.linesIterator.count(_.contains("- Sort [band")) == 1, compacted)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("ingest decision store: appends grow files, compaction restores one per bucket") {
    // The e22 retention gap: every exactly-once append adds a file per
    // touched bucket and the decision store grows files forever. e23
    // closes it with a b7-style compaction leg — this pins the file-count
    // observable on the real query's stores (the readout itself is
    // oracle-gated; here we check the LAYOUT the compaction exists for).
    val sf = "/root/testdata/sf0.001"
    val n = SparkEntry.queries("e23_containment_ingest_ext")(spark, sf).count()
    assert(n == 50L, s"expected one decision per arrival, got $n")
    val dbLoc = new java.io.File(graft.queries.Tables.scratch(
      "graft_ingest_e23_" + graft.queries.Tables.dirTag(sf) + "_db"))
    val bkt = Bucketing.dataFileCount(new java.io.File(dbLoc, "ingest_bkt"))
    val cmp = Bucketing.dataFileCount(new java.io.File(dbLoc, "ingest_cmp"))
    assert(cmp > 0 && cmp <= 8,
      s"compaction must restore at most one file per bucket, got $cmp")
    assert(bkt > cmp,
      s"two appended windows must leave more files than the compacted " +
        s"store ($bkt vs $cmp)")
    // And the rewrite lost nothing: row parity between the stores.
    val e23db = "graft_ingest_e23_" + graft.queries.Tables.dirTag(sf)
    assert(spark.table(s"$e23db.ingest_cmp").count() ==
      spark.table(s"$e23db.ingest_bkt").count())
    // The SELF-EXTENDING window-hash store is compacted in place after
    // every extension (the r19 retention gap): after the run — a standing
    // build plus two committed extensions — win_bkt must sit at one file
    // per bucket, not base + one more file per touched bucket per
    // extension.
    val winFiles = Bucketing.dataFileCount(new java.io.File(dbLoc, "win_bkt"))
    assert(winFiles > 0 && winFiles <= 8,
      s"extended win_bkt store must be compacted in place, got $winFiles files")
  }

  test("store commits run through the Hadoop FileSystem API on file:// URIs") {
    // The v27/b7/d21 store lifecycles commit via deletePath/swapPath; this
    // pins that those primitives resolve the scheme's FileSystem (the same
    // API path a cluster takes to hdfs://) and honor delete/rename/absent-
    // stage semantics. Everything below runs on explicit file:// URIs.
    import org.apache.hadoop.fs.{FileSystem, Path}
    val root = new java.io.File(graft.queries.Tables.scratch("fscommit_spec"))
    Bucketing.clearDir(root)
    val live = new java.io.File(root, "cell=1")
    val staged = new java.io.File(root, "stage/cell=1")
    staged.mkdirs(); live.mkdirs()
    java.nio.file.Files.write(new java.io.File(live, "old.parquet").toPath,
      "old".getBytes)
    java.nio.file.Files.write(new java.io.File(staged, "new.parquet").toPath,
      "new".getBytes)
    val liveUri = "file://" + live.getAbsolutePath
    val stagedUri = "file://" + staged.getAbsolutePath
    // fsFor resolves through Path.getFileSystem — same instance as
    // FileSystem.get on the URI with the session's Hadoop conf.
    val (fs, livePath) = Bucketing.fsFor(liveUri)
    assert(fs.getUri == FileSystem.get(java.net.URI.create(liveUri),
      spark.sparkContext.hadoopConfiguration).getUri)
    assert(fs.exists(livePath) && fs.exists(new Path(stagedUri)))

    // Swap: live's old file must be gone, staged content promoted, staged
    // path gone.
    Bucketing.swapPath(stagedUri, liveUri)
    assert(new java.io.File(live, "new.parquet").isFile)
    assert(!new java.io.File(live, "old.parquet").exists)
    assert(!staged.exists)

    // Absent stage (fully-deleted cell): the live path is simply removed.
    Bucketing.swapPath("file://" + new java.io.File(root, "stage/cell=2")
      .getAbsolutePath, liveUri)
    assert(!live.exists)

    // deletePath is recursive and idempotent.
    Bucketing.deletePath("file://" + root.getAbsolutePath)
    assert(!root.exists)
    Bucketing.deletePath("file://" + root.getAbsolutePath)
  }

  test("swapPath self-heals a crash between the aside-rename and the promote") {
    // Simulated crash state: the previous swap moved live aside to .old
    // and died before promoting staged — live is ABSENT and .old holds the
    // only committed copy. The retry (same staged dir, still on disk) must
    // first restore .old, then run the normal swap; a swapPath that just
    // deleted .old on entry would destroy the only copy if THIS attempt
    // also failed before the promote.
    val root = new java.io.File(graft.queries.Tables.scratch("swapheal_spec"))
    Bucketing.clearDir(root)
    val live = new java.io.File(root, "cell=1")
    val old = new java.io.File(root, ".cell=1.old")
    val staged = new java.io.File(root, "stage/cell=1")
    old.mkdirs(); staged.mkdirs()
    java.nio.file.Files.write(new java.io.File(old, "v1.parquet").toPath,
      "v1".getBytes)
    java.nio.file.Files.write(new java.io.File(staged, "v2.parquet").toPath,
      "v2".getBytes)
    Bucketing.swapPath("file://" + staged.getAbsolutePath,
      "file://" + live.getAbsolutePath)
    assert(new java.io.File(live, "v2.parquet").isFile,
      "retry must complete the swap")
    assert(!old.exists, "the restored-then-replaced aside copy is cleaned up")
    // Crash state with NO staged dir (pure recovery): the orphaned .old is
    // restored as live rather than silently deleted... and the absent
    // stage then means "cell deleted", so live is removed — net identical
    // to a completed delete, never a lost copy mid-retry.
    Bucketing.clearDir(root)
    old.mkdirs()
    java.nio.file.Files.write(new java.io.File(old, "v1.parquet").toPath,
      "v1".getBytes)
    Bucketing.swapPath("file://" + staged.getAbsolutePath,
      "file://" + live.getAbsolutePath)
    assert(!live.exists && !old.exists)
    Bucketing.clearDir(root)
  }

  test("rewriteBucketedInPlace compacts an extended store under its own name") {
    // The e23 win_bkt lifecycle: a standing window-hash store is EXTENDED
    // once per ingest window via exactly-once appends (one more file per
    // touched bucket per extension, forever), then compacted IN PLACE so
    // the next window's decide reads one file per bucket under the SAME
    // table name. Pins the file counts and content parity across the
    // rewrite.
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    val tblDir = new java.io.File(s"/tmp/$db/ext_store")
    Bucketing.reset(spark, s"$db.ext_store", tblDir)
    val ledger = java.nio.file.Files
      .createTempDirectory("graft-ext-ledger").toFile
    def slice(lo: Int, hi: Int) = spark.range(lo, hi)
      .select((col("id") % 101).as("h"), col("id").as("doc_b"))
    Bucketing.writeBucketed(slice(0, 400), s"$db.ext_store", 8, Seq("h"))
    val base = Bucketing.dataFileCount(tblDir)
    assert(base > 0 && base <= 8, s"fresh store must be compact, got $base")
    assert(Bucketing.appendBucketedExactlyOnce(slice(400, 600),
      s"$db.ext_store", 8, Seq("h"), ledger, 0L))
    assert(Bucketing.appendBucketedExactlyOnce(slice(600, 800),
      s"$db.ext_store", 8, Seq("h"), ledger, 1L))
    val extended = Bucketing.dataFileCount(tblDir)
    assert(extended > base,
      s"two extensions must grow the file count ($base -> $extended)")
    spark.catalog.refreshTable(s"$db.ext_store")
    val before = spark.table(s"$db.ext_store")
      .groupBy("h").agg(count(lit(1)).as("n"), sum("doc_b").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Bucketing.rewriteBucketedInPlace(spark, db, "ext_store", Seq("h"), 8)(identity)
    val compacted = Bucketing.dataFileCount(
      new java.io.File(s"/tmp/$db/ext_store"))
    assert(compacted > 0 && compacted <= 8,
      s"in-place compaction must restore at most one file per bucket, got $compacted")
    val after = spark.table(s"$db.ext_store")
      .groupBy("h").agg(count(lit(1)).as("n"), sum("doc_b").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before, "compaction changed the store's content")
    // Committed extensions stay committed: compaction changes layout, not
    // the ledger.
    assert(Bucketing.isCommitted(ledger, 0L) && Bucketing.isCommitted(ledger, 1L))
  }
}
