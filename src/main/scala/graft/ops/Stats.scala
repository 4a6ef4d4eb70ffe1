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
    * n·max|x|·max|y| < 10³⁸ (e.g. 10¹² rows of e9-scaled signals).
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
        }
    // One-row model frame feeding one branch per pair — localCheckpoint
    // (the waterFillQuotas discipline) or each branch re-runs the corpus
    // aggregation.
    val m = df.agg(count(lit(1)).cast(dec).as("_n"), aggs: _*)
      .localCheckpoint()
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
}
