package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Retrieval

/** BM25 retrieval: scoring correctness against hand arithmetic, integer
  * determinism of the e9 gate, and the standing-store probe's scan-side
  * levers (bucket pruning on the term IN-list, exchange-free postings ⋈
  * term_stats).
  */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val db = "graft_retrieval_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  private def tinyDocs = Seq(
    (0L, "apple banana apple"),
    (1L, "banana cherry"),
    (2L, "apple cherry cherry date")).toDF("doc_id", "text")

  test("bm25 contribution matches hand arithmetic exactly (e9 integers)") {
    val q = Seq((100L, "apple")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(tinyDocs, "doc_id", "text", q, k = 10)
      .orderBy("rank").collect()

    // Corpus: n_docs=3, total_tokens=3+2+4=9, avgdl=3.0; df(apple)=2.
    def contrib(tf: Double, dl: Double): Long = {
      val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
      val tfNorm = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 3.0)))
      math.floor(idf * tfNorm * 1e9).toLong
    }
    // doc0: tf=2, dl=3; doc2: tf=1, dl=4. doc1 has no hit.
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 2L))
    assert(got(0).getLong(3) == contrib(2.0, 3.0))
    assert(got(1).getLong(3) == contrib(1.0, 4.0))
  }

  test("ranking ties break to the smaller doc_id") {
    // Two identical docs score identically against any query.
    val d = Seq((5L, "kiwi kiwi"), (3L, "kiwi kiwi"), (9L, "mango"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "kiwi")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(d, "doc_id", "text", q, k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 5L))
    assert(got(0).getLong(3) == got(1).getLong(3))
  }

  test("BM25F: a title hit outranks body repetition; weights fold before saturation") {
    // titleLen=2, wTitle=3: doc 10 has "apple" ONCE in the title (tf~=3);
    // doc 11 has it twice in the body (tf~=2). Saturation (k1=1.2) makes
    // per-occurrence gains sublinear, so folding weights BEFORE it must
    // rank the title doc first despite fewer raw occurrences. (Weighted
    // dl: both docs 4 tokens -> dl~ = 2*3 + 2*1 = 8, neutral.)
    val d = Seq(
      (10L, "apple pie crust butter"),
      (11L, "pie crust apple apple")).toDF("doc_id", "text")
    val q = Seq((99L, "apple")).toDF("query_id", "term")
    val got = Retrieval.bm25TopKFrom(
        Retrieval.fieldedPostings(d, "doc_id", "text", 2, 3, 1),
        Retrieval.fieldedDocLengths(d, "doc_id", "text", 2, 3, 1),
        q, k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L))
    // plain BM25 on the same corpus ranks the repetition first
    val plain = Retrieval.bm25TopK(d, "doc_id", "text", q, k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(plain == Seq(11L, 10L))
  }

  test("fieldedDocLengths clamps short docs to the title field") {
    val d = Seq((1L, "only one"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Retrieval.fieldedDocLengths(d, "doc_id", "text", 3, 3, 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 6L, 2L -> (9L + 2L))) // 2*3; 3*3 + 2*1
  }

  test("a query with no corpus hits returns zero rows, no crash") {
    val q = Seq((9L, "zzzznotaword")).toDF("query_id", "term")
    assert(Retrieval.bm25TopK(tinyDocs, "doc_id", "text", q, k = 5)
      .count() == 0L)
  }

  test("store probe bucket-prunes the term filter and matches the direct path") {
    // 200 docs over a 100-term vocabulary so one query term maps to a
    // strict subset of the 8 term-buckets.
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", expr("concat('term', id % 100)"),
        expr("concat('term', (id + 1) % 100)"),
        expr("concat('term', (id * 7) % 100)")).as("text"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    Retrieval.buildPostingStore(spark, docs, "doc_id", "text", db,
      s"/tmp/$db", nBuckets = 8)

    val q = Seq((7L, "term42"), (7L, "term43")).toDF("query_id", "term")
    val fromStore = Retrieval.bm25FromStore(spark, db, q, k = 5)

    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(fromStore)
    val rows = fromStore.collect()
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    // AQE wraps completed stages in QueryStageExec nodes whose subtrees
    // plain collect() does not enter — recurse through them.
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val here = p.collect { case s: FileSourceScanExec => s }
      val staged = p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      }.flatten
      here ++ staged
    }
    val pruned = scans(plan).flatMap(_.optionalBucketSet)
    assert(pruned.nonEmpty, s"expected bucket-pruned scans, plan:\n$plan")
    pruned.foreach(bs => assert(bs.cardinality() < 8,
      s"term IN-list should select a strict bucket subset, got ${bs.cardinality()}"))

    // The store path must agree with the direct (index-on-the-fly) path.
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rows.map(_.toSeq).sortBy(_.toString).toSeq == direct.toSeq)

    // Past the pushdown cap the probe degrades to a left-semi join — no
    // driver term list, fully lazy — and must return the SAME hits.
    // maxPushdownTerms = 1 forces the semi path for this 2-term batch.
    val semi = Retrieval.bm25FromStore(spark, db, q, k = 5,
        maxPushdownTerms = 1)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(semi.toSeq == direct.toSeq)
  }

  test("append lands stats partials whose folded views equal a fresh build, shuffle-free") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", expr("concat('w', id % 40)"),
        expr("concat('w', (id + 3) % 40)"),
        expr("concat('w', (id * 11) % 40)")).as("text"))
    val dbA = s"${db}_app"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbA LOCATION '/tmp/$dbA'")
    Retrieval.buildPostingStore(spark, docs.filter(col("doc_id") >= 100),
      "doc_id", "text", dbA, s"/tmp/$dbA", nBuckets = 8)
    val ledger = Retrieval.appendLedger(s"/tmp/$dbA")
    Retrieval.appendPostingStore(spark, docs.filter(col("doc_id") < 100),
      "doc_id", "text", dbA, nBuckets = 8, ledger, batchId = 7L)
    // Replay of the committed batch must be a no-op (exactly-once).
    Retrieval.appendPostingStore(spark, docs.filter(col("doc_id") < 100),
      "doc_id", "text", dbA, nBuckets = 8, ledger, batchId = 7L)

    // The global-stats rebuild off the bucketed postings must not shuffle.
    val rebuild = Retrieval.documentFrequencies(spark.table(s"$dbA.postings"))
    val qe = org.apache.spark.sql.classic.GraftBridge.queryExecution(rebuild)
    rebuild.collect()
    val plan = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed df rebuild should be exchange-free:\n$plan")

    // Appended store == fresh full build. Row tables compare raw; the
    // derived stats accumulate PER-BATCH PARTIALS on append (the segment
    // model), so they compare through the probe's folding views — which
    // on the fresh build are value-identity over single rows.
    val dbB = s"${db}_full"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbB LOCATION '/tmp/$dbB'")
    Retrieval.buildPostingStore(spark, docs, "doc_id", "text", dbB,
      s"/tmp/$dbB", nBuckets = 8)
    for (tbl <- Seq("postings", "doc_stats")) {
      val a = spark.table(s"$dbA.$tbl").collect().map(_.toSeq).sortBy(_.toString)
      val b = spark.table(s"$dbB.$tbl").collect().map(_.toSeq).sortBy(_.toString)
      assert(a.toSeq == b.toSeq, s"$tbl differs between append and rebuild")
    }
    // The appended store really holds partials (every vocab term is in
    // both halves, so each term has base + delta df rows)...
    assert(spark.table(s"$dbA.term_stats").count() >
      spark.table(s"$dbB.term_stats").count(),
      "append should land stats partials, not a rebuilt canonical table")
    assert(spark.table(s"$dbA.corpus_stats").count() == 2L)
    // ...and the folded views equal the fresh build's canonical tables.
    def folded(d: String) = (
      Retrieval.termStatsOf(spark, d)(identity)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq,
      Retrieval.corpusStatsOf(spark, d).collect().map(_.toSeq).toSeq)
    assert(folded(dbA) == folded(dbB),
      "folded stats views differ between append and rebuild")
    spark.sql(s"DROP DATABASE IF EXISTS $dbA CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS $dbB CASCADE")
  }

  test("compaction restores one file per bucket; results and pruning survive") {
    val docs = spark.range(240).select(col("id").as("doc_id"),
      concat_ws(" ", expr("concat('c', id % 60)"),
        expr("concat('c', (id + 5) % 60)")).as("text"))
    val dbC = s"${db}_cpt"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbC LOCATION '/tmp/$dbC'")
    Retrieval.buildPostingStore(spark, docs.filter(col("doc_id") >= 160),
      "doc_id", "text", dbC, s"/tmp/$dbC", nBuckets = 8)
    val ledger = Retrieval.appendLedger(s"/tmp/$dbC")
    Retrieval.appendPostingStore(spark, docs.filter(col("doc_id") < 80),
      "doc_id", "text", dbC, nBuckets = 8, ledger, batchId = 1L)
    Retrieval.appendPostingStore(spark,
      docs.filter(col("doc_id") >= 80 && col("doc_id") < 160),
      "doc_id", "text", dbC, nBuckets = 8, ledger, batchId = 2L)

    val q = Seq((3L, "c7"), (3L, "c9")).toDF("query_id", "term")
    val before = Retrieval.bm25FromStore(spark, dbC, q, k = 10)
      .collect().map(_.toSeq).sortBy(_.toString)
    val postingsDir = new java.io.File(s"/tmp/$dbC", "postings")
    val filesBefore = graft.ops.Bucketing.dataFileCount(postingsDir)

    Retrieval.compactPostingStore(spark, dbC, nBuckets = 8)

    val filesAfter = graft.ops.Bucketing.dataFileCount(postingsDir)
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    assert(filesAfter <= 8, s"expected one file per bucket, got $filesAfter")
    // Compaction folds the accumulated stats partials back to canonical:
    // one row per term, one corpus row.
    val termRows = spark.table(s"$dbC.term_stats")
    assert(termRows.count() ==
      termRows.select("term").distinct().count(),
      "compaction must fold term_stats partials to one row per term")
    assert(spark.table(s"$dbC.corpus_stats").count() == 1L,
      "compaction must fold corpus_stats partials to one row")
    val after = Retrieval.bm25FromStore(spark, dbC, q, k = 10)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(after.toSeq == before.toSeq, "compaction changed search results")
    spark.sql(s"DROP DATABASE IF EXISTS $dbC CASCADE")
  }

  test("store delete equals a fresh build on the filtered corpus") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", expr("concat('w', id % 40)"),
        expr("concat('w', (id + 3) % 40)"),
        expr("concat('w', (id * 11) % 40)")).as("text"))
    val dbD = s"${db}_del"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbD LOCATION '/tmp/$dbD'")
    Retrieval.buildPostingStore(spark, docs, "doc_id", "text", dbD,
      s"/tmp/$dbD", nBuckets = 8)
    Retrieval.deleteFromPostingStore(spark, dbD, nBuckets = 8,
      docs.filter(col("doc_id") % 5 === 0).select("doc_id"))

    val dbE = s"${db}_delref"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbE LOCATION '/tmp/$dbE'")
    Retrieval.buildPostingStore(spark, docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", dbE, s"/tmp/$dbE", nBuckets = 8)
    for (tbl <- Seq("postings", "term_stats", "doc_stats", "corpus_stats")) {
      val a = spark.table(s"$dbD.$tbl").collect().map(_.toSeq).sortBy(_.toString)
      val b = spark.table(s"$dbE.$tbl").collect().map(_.toSeq).sortBy(_.toString)
      assert(a.toSeq == b.toSeq, s"$tbl differs between delete and fresh build")
    }
    spark.sql(s"DROP DATABASE IF EXISTS $dbD CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS $dbE CASCADE")
  }

  test("rm3 expansion retrieves a doc the original query missed") {
    val d = Seq((0L, "apple"), (1L, "apple cherry"), (2L, "cherry cherry egg"))
      .toDF("doc_id", "text")
    val q = Retrieval.queriesFromDocs(d, "doc_id", "text", col("doc_id") === 0)
    val base = Retrieval.bm25TopK(d, "doc_id", "text", q, k = 10).collect()
    assert(base.map(_.getLong(2)).toSet === Set(0L, 1L))
    // fb = {doc0, doc1}; doc1 donates "cherry"; pass 2 reaches doc2.
    val got = Retrieval.rm3TopK(d, "doc_id", "text", q,
      fbDocs = 2, fbTerms = 1, k = 10).collect()
    assert(got.map(_.getLong(2)).toSet === Set(0L, 1L, 2L))
  }

  test("rm3 picks expansion terms by summed feedback tf, not position") {
    // Feedback docs {0,1,2} donate cherry (Σtf=2) and egg (Σtf=1);
    // fbTerms=1 must pick cherry — observable because only doc3 is
    // cherry-only and only doc4 is egg-only.
    val d = Seq((0L, "apple"), (1L, "apple cherry egg"), (2L, "apple cherry"),
      (3L, "cherry cherry"), (4L, "egg egg")).toDF("doc_id", "text")
    val q = Retrieval.queriesFromDocs(d, "doc_id", "text", col("doc_id") === 0)
    val got = Retrieval.rm3TopK(d, "doc_id", "text", q,
      fbDocs = 3, fbTerms = 1, k = 10).collect()
    val hit = got.map(_.getLong(2)).toSet
    assert(hit.contains(3L) && !hit.contains(4L))
  }

  test("phrase search finds consecutive terms only, with occurrence counts") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "new york city is in new york state"), // 2 occurrences of "new york city"? no: 1 of the 3-gram
      (2L, "york new city new york city tour"),   // 1 occurrence, terms also appear scrambled
      (3L, "new city york"),                      // all terms, never adjacent in order
      (4L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val phrases = Seq((100L, Array("new", "york", "city"))).toDF("query_id", "terms")
    val got = Retrieval.phraseSearch(corpus, "doc_id", "text", phrases, k = 3)
      .select("query_id", "n_docs", "sum_ids", "n_occ", "min_doc")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((100L, 2L, 3L, 2L, 1L)))
  }

  test("phrase search counts overlapping and repeated occurrences exactly") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a a a a"),          // "a a" occurs at starts 0,1,2 -> 3
      (2L, "a b a b a"),        // "a b" at 0,2 -> 2
      (3L, "b a"))              // 0 occurrences
      .toDF("doc_id", "text")
    val gotAA = Retrieval.phraseSearch(corpus, "doc_id", "text",
        Seq((1L, Array("a", "a"))).toDF("query_id", "terms"), k = 2)
      .select("n_docs", "n_occ").as[(Long, Long)].collect()
    assert(gotAA.toSeq == Seq((1L, 3L)))
    val gotAB = Retrieval.phraseSearch(corpus, "doc_id", "text",
        Seq((1L, Array("a", "b"))).toDF("query_id", "terms"), k = 2)
      .select("n_docs", "n_occ").as[(Long, Long)].collect()
    assert(gotAB.toSeq == Seq((1L, 2L)))
  }
}
