package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.engine.Caches.Registered

/** Real BPE vocabulary learning + application (Sennrich et al. 2016 train
  * loop, not just the pre-tokenizer count t8 reports): iteratively merge the
  * most frequent adjacent symbol pair, starting from characters.
  *
  * Scale shape: training runs on the WORD-FREQUENCY table, not the corpus —
  * the classic formulation. One corpus pass builds (word, count); every
  * merge round is then a pair-count groupBy over the distinct vocabulary
  * (keyed shuffle, partial-aggregated) + a 1-row argmax action. At 100 TB
  * the vocab is orders of magnitude smaller than the corpus, and the corpus
  * text itself is traversed exactly twice (vocab build + final re-tokenize).
  *
  * Symbol sequences are paren-encoded ("low" → "(l)(o)(w)"): applying merge
  * (a, b) is then the literal string replace "(a)(b)" → "(ab)", whose
  * left-to-right non-overlapping scan is EXACTLY the greedy BPE application
  * order — and has identical semantics in Spark (UTF8String.replace) and
  * DuckDB (replace), which is what makes the trained merge table
  * oracle-replicable. Symbols stay in [a-z]+ (training corpus is the
  * alphabetic words), so the parens can never collide with symbol text.
  */
object Bpe {

  private def wordsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))

  /** Char-level paren encoding: "low" → "(l)(o)(w)". */
  def charEncode(w: Column): Column = regexp_replace(w, "(.)", "($1)")

  /** One merge step applied to an encoded column. */
  def applyMerge(enc: Column, a: String, b: String): Column =
    call_function("replace", enc, lit(s"($a)($b)"), lit(s"($a$b)"))

  /** Symbol count of an encoded word = number of '(' markers. */
  def tokenCount(enc: Column): Column =
    (length(enc) - length(call_function("replace", enc, lit("("), lit(""))))
      .cast("int")

  private def freqVocab(docs: DataFrame, textCol: String): DataFrame =
    wordsOf(docs, textCol)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("n"), charEncode(col("w")).as("enc"))

  /** Adjacent-symbol pair counts of an encoded vocab, weighted by word
    * frequency — the per-round shuffle of BPE training (keyed groupBy,
    * partial-aggregated; the vocab, not the corpus, is the input).
    */
  private def pairCounts(cur: DataFrame): DataFrame = {
    // Spark SQL string literals eat single backslashes, hence \\\\ here.
    val syms = expr("regexp_extract_all(enc, '\\\\(([a-z]+)\\\\)', 1)")
    cur
      .select(col("n"), explode(arrays_zip(
        slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
        slice(syms, lit(2), greatest(size(syms) - 1, lit(0))))).as("p"))
      .groupBy(col("p.0").as("a"), col("p.1").as("b"))
      .agg(sum("n").as("cnt"))
  }

  /** Learn `merges` BPE merge rules from the corpus. Each round: adjacent
    * symbol pairs of every vocab word, weighted by word frequency, one
    * groupBy + a deterministic argmax (max count, ties → lexicographically
    * smallest (a, b) — pinned so any engine reproduces the table). Returns
    * the ordered merge list. Stops early if no pair remains.
    */
  def train(docs: DataFrame, textCol: String, merges: Int): Seq[(String, String)] = {
    val vocab = freqVocab(docs, textCol)
      .persistTracked()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = vocab
    var done = false
    for (_ <- 1 to merges if !done) {
      val best = pairCounts(cur)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        out += ((a, b))
        // Narrow map over the persisted vocab; round i's lineage is i cheap
        // replaces on top of the cached frame (M is small by construction).
        cur = cur.select(col("n"), applyMerge(col("enc"), a, b).as("enc"))
      }
    }
    vocab.unpersist()
    out.toSeq
  }

  /** BATCHED BPE training — the driver-loop fix for production vocab sizes
    * (VERDICT r07: one argmax round per merge makes a 32k vocab ~32k
    * sequential Spark jobs; the data never becomes the wall, the round
    * count does). Standard distributed-BPE batching: per round, take the
    * top-`window` pairs by (count desc, a, b) and apply, in rank order,
    * every pair that shares NO symbol with ANY higher-ranked pair in the
    * window (capped at `batchCap`). Symbol-disjointness makes same-round
    * interference rare, but is not a strict commutativity proof: a kept
    * pair whose MERGED symbol equals another kept pair's operand (e.g.
    * ('a','b') and ('ab','x') in one batch) can interact, with the earlier
    * replace feeding the later one. The batch is therefore applied in the
    * pinned rank order, which keeps both the merge LIST and the rewrite
    * deterministic and oracle-replicable (the oracle replays the identical
    * replaces in the identical order).
    *
    * Selection is greedy first-fit over the ranked window (the standard
    * batched-BPE rule): scan ranks in order, keep a pair iff neither of
    * its symbols was used by an already-kept pair this round, stop at
    * `batchCap`. The scan is sequential but over <= `window` DRIVER-side
    * rows — the data-parallel work stays one pair-count groupBy per round
    * — and a SQL oracle replicates it as a single-row recursion carrying
    * the used-symbol list ([[oracleSqlBatched]]).
    */
  def trainBatched(docs: DataFrame, textCol: String, rounds: Int,
      window: Int, batchCap: Int): Seq[(String, String)] = {
    val vocab = freqVocab(docs, textCol)
      .persistTracked()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = vocab
    var done = false
    for (_ <- 1 to rounds if !done) {
      val top = pairCounts(cur)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(window).collect()
        .map(r => (r.getString(0), r.getString(1)))
      val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val used = scala.collection.mutable.HashSet.empty[String]
      for ((a, b) <- top
           if sel.size < batchCap && !used(a) && !used(b)) {
        sel += ((a, b)); used += a; used += b
      }
      if (sel.isEmpty) done = true
      else {
        out ++= sel
        cur = sel.foldLeft(cur) { case (c, (a, b)) =>
          c.select(col("n"), applyMerge(col("enc"), a, b).as("enc")) }
      }
    }
    vocab.unpersist()
    out.toSeq
  }

  /** Each DISTINCT alphabetic word of the corpus, encoded ONCE under the
    * merge table: (w, toks, tw) where toks is the BPE token count and tw
    * the '|'-joined token string. This is the production application
    * shape — the M-replace fold runs over the distinct VOCABULARY, not
    * over every word occurrence, so application cost is O(vocab × M)
    * + one keyed join back to the corpus instead of O(corpus × M)
    * per-row replaces (the difference between minutes and days at
    * M = 32k on 100 TB).
    */
  /** Merges folded per plan stage before the expression tree is cut. One
    * nested replace per merge means expression DEPTH M: past a few
    * thousand merges Catalyst's analyzer/optimizer recursion and Janino's
    * method-size limits become the wall (production vocabularies are
    * 32k–100k merges). Chunking caps the depth at this constant; a
    * sequence of plain `select`s would NOT (CollapseProject folds adjacent
    * projections right back into one M-deep expression), so each chunk
    * boundary is a `localCheckpoint` — an eager plan cut over the DISTINCT
    * VOCABULARY frame (small by construction), with the previous chunk's
    * blocks released as soon as the next stage lands. The final stage's
    * blocks back the returned frame and are ContextCleaner-owned.
    */
  private[graft] val MergeChunk = 256

  /** Release the storage blocks behind a `localCheckpoint()`'d frame.
    * `Dataset.unpersist` is a NO-OP here — it only uncaches
    * CacheManager-registered plans, while a local checkpoint's blocks
    * belong to the internal checkpointed RDD (otherwise freed only when
    * the ContextCleaner eventually GCs it). The checkpointed RDD is the
    * `LogicalRDD` leaf the eager checkpoint left as the frame's whole
    * plan; unpersist THAT. At 32k–100k merges this is the difference
    * between 2 live chunk frames and hundreds awaiting GC.
    */
  private def releaseCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }

  /** Apply `merges` to pre-encoded (w, enc) rows, chunked per
    * [[MergeChunk]]. Single-chunk tables (every current gate) take the
    * plain fold — zero materialization, identical plan to the unchunked
    * original.
    */
  private def foldMerges(base: DataFrame,
      merges: Seq[(String, String)], chunk: Int): DataFrame = {
    def fold(df: DataFrame, ms: Seq[(String, String)]): DataFrame =
      df.select(col("w"), ms.foldLeft(col("enc")) {
        case (c, (a, b)) => applyMerge(c, a, b)
      }.as("enc"))
    if (merges.sizeIs <= chunk) fold(base, merges)
    else {
      var cur = base
      var prev: DataFrame = null
      merges.grouped(chunk).foreach { ms =>
        val ck = fold(cur, ms).localCheckpoint()
        if (prev != null) releaseCheckpointBlocks(prev)
        prev = ck
        cur = ck
      }
      cur
    }
  }

  private def encodedVocab(words: DataFrame, merges: Seq[(String, String)],
      chunk: Int = MergeChunk): DataFrame = {
    def rep(c: Column, from: String, to: String): Column =
      call_function("replace", c, lit(from), lit(to))
    foldMerges(
      words.select(col("w")).distinct()
        .select(col("w"), charEncode(col("w")).as("enc")),
      merges, chunk)
      .select(col("w"), tokenCount(col("enc")).as("toks"),
        rep(rep(rep(col("enc"), ")(", "|"), "(", ""), ")", "").as("tw"))
  }

  /** Re-tokenize the corpus under a trained merge table: per doc, the
    * alphabetic word count and the total BPE token count. PRODUCTION
    * PATH: encode each distinct vocab word once ([[encodedVocab]]), then
    * hash-join the (small) encoded vocab back to word occurrences and
    * aggregate per doc — two corpus passes, no per-occurrence merge fold.
    * AQE broadcasts the vocab side when it fits; otherwise the join keys
    * on the word, the natural co-location. Matches the oracle's
    * `wd JOIN tc USING (w) GROUP BY doc_id` shape exactly.
    */
  def tokenCounts(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)],
      chunk: Int = MergeChunk): DataFrame =
    occurrencesWithTokens(docs, textCol, merges, chunk)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_words"),
        sum("toks").cast("int").as("n_bpe"))

  /** Shared occurrence×vocab join of [[tokenCounts]] and
    * [[fertilityBySource]]: each DISTINCT word encoded once, hash-joined
    * back to its (doc_id, w) occurrences with the token count attached —
    * one definition, so the two consumers cannot drift.
    */
  private def occurrencesWithTokens(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)], chunk: Int): DataFrame = {
    val wp = wordsOf(docs, textCol)
    wp.join(encodedVocab(wp, merges, chunk), "w")
  }

  /** The superseded per-occurrence application: folds all M replaces over
    * every word occurrence — O(corpus × M) narrow work, zero pre-agg
    * shuffle. Kept as the semantics witness for [[tokenCounts]] (BpeSpec
    * proves parity); do not use at production vocab sizes.
    */
  def tokenCountsFold(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = merges.foldLeft(charEncode(col("w"))) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    wordsOf(docs, textCol)
      .select(col("doc_id"), tokenCount(enc).as("toks"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_words"),
        sum("toks").cast("int").as("n_bpe"))
  }

  /** Train-then-apply in one query (the t13 gate shape). */
  def trainApply(docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    tokenCounts(docs, textCol, train(docs, textCol, nMerges))

  /** t18: TOKENIZER FERTILITY REPORT — per source, under a trained merge
    * table: fertility (tokens per word) and compression (alpha chars per
    * token), the standard tokenizer-eval numbers (cf. the fertility
    * metric of Rust et al., ACL 2021 "How good is your tokenizer?") a
    * pipeline publishes per corpus slice before committing to a vocab —
    * a slice whose fertility is an outlier is being tokenized badly
    * (wrong language/domain for the learned merges), and its token
    * BUDGET (what training bills by) inflates accordingly.
    *
    * Scale shape: [[tokenCounts]]' vocab-join chain (encode each DISTINCT
    * word once, hash-join back to occurrences), one per-doc rollup, one
    * |sources|-row rollup. The ratios are exact-integer divisions rounded
    * 6 dp — engine-exact cross-engine.
    */
  def fertilityBySource(docs: DataFrame, textCol: String, srcCol: String,
      merges: Seq[(String, String)], chunk: Int = MergeChunk): DataFrame = {
    val perDoc = occurrencesWithTokens(docs, textCol, merges, chunk)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("toks").as("n_bpe"),
        sum(length(col("w"))).as("n_chars"))
    perDoc.join(docs.select(col("doc_id"), col(srcCol)), "doc_id")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        round(sum("n_bpe").cast("double") / sum("n_words"), 6)
          .as("fertility"),
        round(sum("n_chars").cast("double") / sum("n_bpe"), 6)
          .as("chars_per_token"))
  }

  /** Batched train-then-apply (the t13b gate shape). */
  def trainApplyBatched(docs: DataFrame, textCol: String, rounds: Int,
      window: Int, batchCap: Int): DataFrame =
    tokenCounts(docs, textCol,
      trainBatched(docs, textCol, rounds, window, batchCap))

  /** Tokenize the corpus to per-doc TOKEN STREAMS under a trained merge
    * table — the step between vocabulary training (t13/t13b) and sequence
    * packing (o8/o12): each doc's alphabetic words in order, tokens '|'-
    * joined within a word, words ' '-joined. PRODUCTION PATH (the shape
    * the oracle uses): encode each DISTINCT vocab word once
    * ([[encodedVocab]] — O(vocab × M), not O(corpus × M)), hash-join back
    * to positional word occurrences, and reassemble each doc in order
    * with a sorted collect. The reassembly groupBy keys on doc_id — the
    * same key the downstream packers (o8/o12) consume, so the shuffle is
    * reused, and per-doc state is bounded by doc length. Docs with no
    * alphabetic words are dropped (inner vocab join).
    */
  def tokenStreams(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val wp = docs.select(col("doc_id"),
      posexplode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
        .as(Seq("pos", "w")))
    wp.join(encodedVocab(wp, merges), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_words"),
        sum("toks").cast("int").as("n_bpe"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tw")))),
          x => x.getField("tw")), " ").as("tok_str"))
  }

  /** The superseded one-pass doc-level fold: the whole doc cleaned to
    * space-separated words, every letter paren-encoded, all M merge
    * replaces folded per ROW — zero explode/join/shuffle before the
    * output but O(corpus × M) work. Merges are word-local (the "(a)(b)"
    * pattern can't span the space between words), so this provably
    * equals the join path ([[tokenStreams]]); BpeSpec gates the parity.
    * Kept as the semantics witness; do not use at production vocab sizes.
    */
  def tokenStreamsFold(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val cleaned = trim(regexp_replace(lower(col(textCol)), "[^a-z]+", " "))
    val enc = merges.foldLeft(regexp_replace(cleaned, "([a-z])", "($1)")) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    def rep(c: Column, from: String, to: String): Column =
      call_function("replace", c, lit(from), lit(to))
    docs.select(col("doc_id"),
        size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
          .cast("int").as("n_words"),
        tokenCount(enc).as("n_bpe"),
        rep(rep(rep(enc, ")(", "|"), "(", ""), ")", "").as("tok_str"))
      .filter(col("n_words") > 0)
  }

  /** Batched-train-then-stream (the t14 gate shape). */
  def trainStreamBatched(docs: DataFrame, textCol: String, rounds: Int,
      window: Int, batchCap: Int): DataFrame =
    tokenStreams(docs, textCol,
      trainBatched(docs, textCol, rounds, window, batchCap))

  /** DuckDB oracle replicating [[train]] + [[tokenCounts]] exactly: M
    * chained (materialized) CTE stages, each doing the same pair-count →
    * deterministic argmax → literal replace. Generated, not hand-written,
    * so the merge count stays a parameter.
    */
  def oracleSql(nMerges: Int): String =
    prefixStages() + mergeStages(nMerges) + finalStages(nMerges)

  /** [[oracleSql]]'s merge chain then [[fertilityBySource]]'s per-source
    * rollup instead of the per-doc one.
    */
  def oracleSqlFertility(nMerges: Int): String =
    prefixStages() + mergeStages(nMerges) +
      s"""tc AS (
         |  SELECT replace(replace(enc, '(', ''), ')', '') AS w,
         |    CAST(len(enc) - len(replace(enc, '(', '')) AS INT) AS toks
         |  FROM e$nMerges),
         |pd AS (
         |  SELECT doc_id, count(*) AS n_words, sum(toks) AS n_bpe,
         |    sum(len(wd.w)) AS n_chars
         |  FROM wd JOIN tc USING (w) GROUP BY doc_id)
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(pd.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(pd.n_bpe) AS BIGINT) AS n_tokens,
         |  CAST(sum(pd.n_chars) AS BIGINT) AS n_chars,
         |  round(CAST(sum(pd.n_bpe) AS DOUBLE) / sum(pd.n_words), 6) AS fertility,
         |  round(CAST(sum(pd.n_chars) AS DOUBLE) / sum(pd.n_bpe), 6) AS chars_per_token
         |FROM pd JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin

  private def mergeStages(nMerges: Int): String = {
    val sb = new StringBuilder
    for (i <- 1 to nMerges) {
      sb ++= s"""p$i AS (
                |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(n) AS cnt FROM (
                |    SELECT regexp_extract_all(enc, '\\(([a-z]+)\\)', 1) AS syms, n,
                |      unnest(range(1, greatest(len(regexp_extract_all(enc, '\\(([a-z]+)\\)', 1)), 1))) AS i
                |    FROM e${i - 1})
                |  GROUP BY 1, 2),
                |b$i AS (SELECT a, b FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
                |e$i AS MATERIALIZED (
                |  SELECT coalesce(replace(enc, '(' || a || ')(' || b || ')', '(' || a || b || ')'), enc) AS enc, n
                |  FROM e${i - 1} LEFT JOIN b$i ON TRUE),
                |""".stripMargin
    }
    sb.toString
  }

  /** DuckDB oracle replicating [[trainBatched]] + [[tokenCounts]]: per
    * round, the same pair-count stage, then the greedy first-fit batch
    * selection expressed as a SINGLE-ROW recursive CTE walking the ranked
    * window and carrying the used-symbol list and the kept-pair list —
    * exactly the engine's sequential scan. The kept pairs are then padded
    * to a FIXED `batchCap` slots (pad slots resolve to a '(~)' pattern
    * that can never match the [a-z]+ symbol alphabet, so they are no-op
    * replaces), and application is `batchCap` nested replaces in kept
    * order — static SQL for a data-dependent batch, total under an
    * exhausted pair supply.
    */
  def oracleSqlBatched(rounds: Int, window: Int, batchCap: Int): String = {
    val sb = new StringBuilder
    sb ++= prefixStages(recursive = true)
    for (i <- 1 to rounds) sb ++= batchedStage(i, window, batchCap)
    sb ++= finalStages(rounds)
    sb.toString
  }

  /** One batched-training round of [[oracleSqlBatched]]/[[oracleSqlStreams]]:
    * pair counts of e${i-1}, the ranked window, the single-row recursive
    * greedy selection, fixed-slot padding, and the nested-replace rewrite
    * into e$i.
    */
  private def batchedStage(i: Int, window: Int, batchCap: Int): String = {
    val nested = (1 to batchCap).foldLeft("enc") { (acc, j) =>
      s"replace($acc, (SELECT coalesce('(' || a || ')(' || b || ')', '(~)') FROM b$i WHERE k = $j), " +
        s"(SELECT coalesce('(' || a || b || ')', '(~)') FROM b$i WHERE k = $j))"
    }
    val fits = s"len(g.sel) < $batchCap AND NOT list_contains(g.used, r.a)" +
      " AND NOT list_contains(g.used, r.b)"
    s"""p$i AS (
       |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(n) AS cnt FROM (
       |    SELECT regexp_extract_all(enc, '\\(([a-z]+)\\)', 1) AS syms, n,
       |      unnest(range(1, greatest(len(regexp_extract_all(enc, '\\(([a-z]+)\\)', 1)), 1))) AS i
       |    FROM e${i - 1})
       |  GROUP BY 1, 2),
       |r$i AS (SELECT a, b, row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
       |  FROM p$i ORDER BY cnt DESC, a, b LIMIT $window),
       |g$i(rn, used, sel) AS (
       |  SELECT CAST(0 AS BIGINT), CAST([] AS VARCHAR[]),
       |    CAST([] AS STRUCT(a VARCHAR, b VARCHAR)[])
       |  UNION ALL
       |  SELECT r.rn,
       |    CASE WHEN $fits
       |      THEN list_append(list_append(g.used, r.a), r.b) ELSE g.used END,
       |    CASE WHEN $fits
       |      THEN list_append(g.sel, struct_pack(a := r.a, b := r.b)) ELSE g.sel END
       |  FROM g$i g JOIN r$i r ON r.rn = g.rn + 1),
       |f$i AS (SELECT sel FROM g$i ORDER BY rn DESC LIMIT 1),
       |t$i AS (SELECT f.sel[g.k].a AS a, f.sel[g.k].b AS b, g.k AS k
       |  FROM f$i f, (SELECT unnest(range(1, ${batchCap + 1})) AS k) g
       |  WHERE g.k <= len(f.sel)),
       |b$i AS (SELECT g.k, t.a, t.b
       |  FROM (SELECT unnest(range(1, ${batchCap + 1})) AS k) g
       |  LEFT JOIN t$i t USING (k)),
       |e$i AS MATERIALIZED (
       |  SELECT $nested AS enc, n FROM e${i - 1}),
       |""".stripMargin
  }

  /** DuckDB oracle replicating [[trainBatched]] + [[tokenStreams]]: the
    * batched round stages, then the PRODUCTION-variant application — each
    * distinct vocab word's final encoding mapped to its token string once,
    * joined back to the corpus word occurrences, re-assembled in document
    * order. Equivalent to the engine's one-pass doc-level fold because
    * merges are word-local on both sides.
    */
  def oracleSqlStreams(rounds: Int, window: Int, batchCap: Int): String = {
    val sb = new StringBuilder
    sb ++= prefixStages(recursive = true)
    for (i <- 1 to rounds) sb ++= batchedStage(i, window, batchCap)
    sb ++= s"""tc AS (
              |  SELECT replace(replace(enc, '(', ''), ')', '') AS w,
              |    CAST(len(enc) - len(replace(enc, '(', '')) AS INT) AS toks,
              |    replace(replace(replace(enc, ')(', '|'), '(', ''), ')', '') AS tw
              |  FROM e$rounds),
              |wp AS (
              |  SELECT doc_id, lst[i] AS w, i AS pos FROM (
              |    SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+', 0) AS lst,
              |      unnest(range(1, len(regexp_extract_all(lower(text), '[a-z]+', 0)) + 1)) AS i
              |    FROM documents))
              |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
              |  CAST(sum(toks) AS INT) AS n_bpe,
              |  string_agg(tw, ' ' ORDER BY pos) AS tok_str
              |FROM wp JOIN tc USING (w)
              |GROUP BY doc_id""".stripMargin
    sb.toString
  }

  private def prefixStages(recursive: Boolean = false): String = {
    val kw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$kw wd AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w
       |  FROM documents),
       |e0 AS MATERIALIZED (
       |  SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS enc, count(*) AS n
       |  FROM wd GROUP BY w),
       |""".stripMargin
  }

  private def finalStages(lastStage: Int): String =
    s"""tc AS (
       |  SELECT replace(replace(enc, '(', ''), ')', '') AS w,
       |    CAST(len(enc) - len(replace(enc, '(', '')) AS INT) AS toks
       |  FROM e$lastStage)
       |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
       |  CAST(sum(toks) AS INT) AS n_bpe
       |FROM wd JOIN tc USING (w)
       |GROUP BY doc_id""".stripMargin
}
