package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-signal agreement statistics over integer-pinned quality signals.
  *
  * The curation stack scores every document several independent ways
  * (heuristic quality, linear classifier, LM surprisal, raw length); the
  * standard sanity report before gating on any of them is their pairwise
  * Pearson agreement — near-duplicate signals are redundant gates, and a
  * NEGATIVE correlation between two "quality" scores is a bug in one of
  * them.
  */
object Stats {

  /** Pairwise Pearson correlation over INTEGER signal columns, with the
    * moment sums (Σx, Σx², Σxy) accumulated EXACTLY as DECIMAL(38,0) —
    * order-independent, so the result is bit-stable under any partitioning
    * (built-in `corr` keeps running doubles whose low bits depend on
    * aggregation order: the t15 reassociation hazard). The one FP step is
    * the final closed form num/√(dx·dy) on doubles CONVERTED FROM the same
    * exact integers in any engine, floor-scaled to e6 (COVERAGE.md "Oracle
    * pinning"). A degenerate (constant) signal yields NULL, matching
    * SQL `corr`.
    *
    * Overflow bound: n·Σx·y must fit DECIMAL(38,0) — safe while
    * n·max|x|·max|y| < 10³⁸ (e.g. 10¹² rows of e9-scaled signals). The
    * bound is ENFORCED at runtime: non-ANSI Spark nulls a DECIMAL
    * overflow silently while DuckDB's HUGEINT keeps exact values to
    * ~1.7e38, so past the envelope the engines would diverge (NULL vs a
    * value) without erroring — this fails fast instead. The check rides
    * the same one-row moment pass (max|x| per signal), costing no extra
    * scan.
    *
    * Scale shape: ONE partial-aggregated global pass over the signal frame
    * (the single-partition reduce sees #partitions rows); the pair
    * expansion runs on the localCheckpoint'd one-row moment frame, so the
    * corpus is read once regardless of how many pairs are reported.
    */
  def corrPairsExact(df: DataFrame, sigCols: Seq[String]): DataFrame = {
    require(sigCols.size >= 2, "need at least two signal columns")
    val dec = DecimalType(38, 0)
    val selfAndCross = for {
      i <- sigCols.indices; j <- i until sigCols.size
    } yield (sigCols(i), sigCols(j))
    val aggs =
      sigCols.map(c => sum(col(c).cast(dec)).as(s"_s_$c")) ++
        selfAndCross.map { case (a, b) =>
          sum(col(a).cast(dec) * col(b).cast(dec)).as(s"_p_${a}_${b}")
        } ++
        sigCols.map(c => max(abs(col(c).cast(dec))).as(s"_m_$c"))
    // One-row model frame feeding one branch per pair — localCheckpoint
    // (the waterFillQuotas discipline) or each branch re-runs the corpus
    // aggregation.
    val m = df.agg(count(lit(1)).cast(dec).as("_n"), aggs: _*)
      .localCheckpoint()
    // Enforce the documented envelope from the SAME one-row frame: every
    // moment Spark accumulates is bounded by n·max|a|·max|b|, and a
    // DECIMAL(38,0) overflow in non-ANSI mode is a silent NULL, not an
    // error. One bounded head() on the model row (k signals), no scan.
    locally {
      val row = m.head()
      val n = BigDecimal(row.getDecimal(row.fieldIndex("_n")))
      val limit = BigDecimal("1e38")
      for ((a, b) <- selfAndCross) {
        val ma = Option(row.getDecimal(row.fieldIndex(s"_m_$a")))
          .map(BigDecimal(_)).getOrElse(BigDecimal(0))
        val mb = Option(row.getDecimal(row.fieldIndex(s"_m_$b")))
          .map(BigDecimal(_)).getOrElse(BigDecimal(0))
        require(n * ma * mb < limit,
          s"corrPairsExact overflow envelope exceeded for ($a, $b): " +
            s"n=$n max|$a|=$ma max|$b|=$mb — n*max|a|*max|b| must stay " +
            "under 1e38 (DECIMAL(38,0)); rescale the signals first")
      }
    }
    val rows = for {
      i <- sigCols.indices; j <- (i + 1) until sigCols.size
    } yield {
      val (a, b) = (sigCols(i), sigCols(j))
      val num = col("_n") * col(s"_p_${a}_${b}") - col(s"_s_$a") * col(s"_s_$b")
      val dx = col("_n") * col(s"_p_${a}_${a}") - col(s"_s_$a") * col(s"_s_$a")
      val dy = col("_n") * col(s"_p_${b}_${b}") - col(s"_s_$b") * col(s"_s_$b")
      m.select(lit(a).as("sig_x"), lit(b).as("sig_y"),
        col("_n").cast("long").as("n"),
        when(dx > 0 && dy > 0,
          floor(num.cast("double")
            / sqrt(dx.cast("double") * dy.cast("double")) * lit(1e6)))
          .cast("long").as("corr_e6"))
    }
    rows.reduce(_ unionByName _)
  }

  /** PER-GROUP GINI COEFFICIENT of a size column — the corpus
    * concentration report: is a source's token mass spread across its
    * documents or locked up in a few giants? (Feeds sampling decisions:
    * a high-Gini source subsampled by DOCUMENT count still contributes
    * most of its mass from the giants.) Exact rank formula over the
    * ascending sort: G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx), emitted as a
    * BIGINT floor-scaled e6 — integer arithmetic end-to-end, so the
    * value is bit-identical cross-engine (COVERAGE.md "Oracle pinning").
    *
    * Shape: one window rank PARTITIONED BY the group (parallel across
    * groups, the w2 ntile discipline — no global sort) + one groupBy.
    * Overflow envelope: 2·Σ i·xᵢ·10⁶ and n·Σx must fit BIGINT — holds
    * while n²·max(x) < 4.6·10¹² per group (every gate SF by orders of
    * magnitude); ENFORCED in-plan via assert_true so Spark's silent
    * long wraparound can never diverge from DuckDB's exact HUGEINT —
    * past the envelope the job fails loudly and the fix is the
    * corrPairsExact DECIMAL(38,0) spelling.
    */
  def giniByGroup(df: DataFrame, groupCol: String, sizeCol: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(sizeCol), col(idCol))
    df.select(col(groupCol), col(idCol), col(sizeCol))
      .withColumn("_rk", row_number().over(w).cast("long"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("sum_size"),
        sum(col("_rk") * col(sizeCol)).as("_s1"))
      .filter(assert_true(
        col("_s1") <= lit(4600000000000L) &&
          col("n_docs") * col("sum_size") <= lit(Long.MaxValue / 2),
        lit("giniByGroup BIGINT envelope exceeded — use DECIMAL(38,0)"))
        .isNull)
      .select(col(groupCol), col("n_docs"), col("sum_size"),
        expr("((2 * _s1 - (n_docs + 1) * sum_size) * 1000000)" +
          " div (n_docs * sum_size)").as("gini_e6"))
  }
}
