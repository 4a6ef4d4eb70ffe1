package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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

  /** Learn `merges` BPE merge rules from the corpus. Each round: adjacent
    * symbol pairs of every vocab word, weighted by word frequency, one
    * groupBy + a deterministic argmax (max count, ties → lexicographically
    * smallest (a, b) — pinned so any engine reproduces the table). Returns
    * the ordered merge list. Stops early if no pair remains.
    */
  def train(docs: DataFrame, textCol: String, merges: Int): Seq[(String, String)] = {
    val vocab = wordsOf(docs, textCol)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("n"), charEncode(col("w")).as("enc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = vocab
    var done = false
    for (_ <- 1 to merges if !done) {
      // Spark SQL string literals eat single backslashes, hence \\\\ here.
      val syms = expr("regexp_extract_all(enc, '\\\\(([a-z]+)\\\\)', 1)")
      val best = cur
        .select(col("n"), explode(arrays_zip(
          slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
          slice(syms, lit(2), greatest(size(syms) - 1, lit(0))))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum("n").as("cnt"))
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

  /** Re-tokenize the corpus under a trained merge table: per doc, the
    * alphabetic word count and the total BPE token count. The merge fold is
    * per-row narrow arithmetic (codegen'd string replaces) — zero shuffle
    * before the final per-doc aggregate. (A production variant would join
    * words against the pre-encoded vocab instead of re-folding per
    * occurrence; the fold keeps the query self-contained and is the same
    * O(corpus × M) work the join's build side pays.)
    */
  def tokenCounts(docs: DataFrame, textCol: String,
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

  /** DuckDB oracle replicating [[train]] + [[tokenCounts]] exactly: M
    * chained (materialized) CTE stages, each doing the same pair-count →
    * deterministic argmax → literal replace. Generated, not hand-written,
    * so the merge count stays a parameter.
    */
  def oracleSql(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH wd AS MATERIALIZED (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w
             |  FROM documents),
             |e0 AS MATERIALIZED (
             |  SELECT regexp_replace(w, '(.)', '(\1)', 'g') AS enc, count(*) AS n
             |  FROM wd GROUP BY w),
             |""".stripMargin
    for (i <- 1 to nMerges) {
      sb ++= s"""p$i AS (
                |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(n) AS cnt FROM (
                |    SELECT regexp_extract_all(enc, '\\(([a-z]+)\\)', 1) AS syms, n,
                |      unnest(range(1, greatest(len(regexp_extract_all(enc, '\\(([a-z]+)\\)', 1)), 1))) AS i
                |    FROM e${i - 1})
                |  GROUP BY 1, 2),
                |b$i AS (SELECT a, b FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
                |e$i AS MATERIALIZED (
                |  SELECT replace(enc, '(' || a || ')(' || b || ')', '(' || a || b || ')') AS enc, n
                |  FROM e${i - 1} CROSS JOIN b$i),
                |""".stripMargin
    }
    sb ++= s"""tc AS (
              |  SELECT replace(replace(enc, '(', ''), ')', '') AS w,
              |    CAST(len(enc) - len(replace(enc, '(', '')) AS INT) AS toks
              |  FROM e$nMerges)
              |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
              |  CAST(sum(toks) AS INT) AS n_bpe
              |FROM wd JOIN tc USING (w)
              |GROUP BY doc_id""".stripMargin
    sb.toString
  }
}
