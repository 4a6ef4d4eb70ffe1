package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_cut_spans(text, cut_starts, n[, min_run])`: remove n-token windows
  * starting at the given 0-based token positions from the whitespace-token
  * stream of `text`, merging overlapping windows into runs, and return
  * `struct<n_tokens int, n_kept int, n_cut_runs int, cleaned string>` — the
  * per-row rewrite kernel of exact-substring span removal
  * (ops/Dedup.cutSpans, ops/Dedup.cutLongSpans).
  *
  * `min_run` (default 0) generalizes the fixed-n operating point to
  * ANY-LENGTH run removal: after merging overlapping windows, only merged
  * runs spanning >= min_run tokens are cut — shorter incidental repeats
  * survive. A duplicated run of R >= min_run tokens produces R-n+1
  * consecutive shared n-windows whose merged extent is exactly R, so it is
  * removed in full; with min_run <= n every window is cut (the c2
  * behavior, bit-identical to the pre-min_run kernel).
  *
  * A HOF spelling (`filter(ws, (w, i) -> !exists(cuts, c -> ...))`) is
  * semantically identical but evaluates an interpreted lambda per token ×
  * per cut — the t9 failure mode on a corpus-scale scan, and O(T·C) per
  * doc besides. This kernel is one codegen'd call, O(T + C log C): sort
  * the cut starts once, merge into runs, sweep the tokens against the
  * qualifying runs.
  *
  * Tokenization parity: `String.split("\\s+", -1)` — identical to Spark's
  * `split` and DuckDB's `string_split_regex` (same contract as
  * [[PolyShinglesExpr]], whose positions the cut starts come from).
  */
case class CutSpansExpr(left: Expression, right: Expression, n: Int,
    minRun: Int = 0)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
      (right.dataType == ArrayType(IntegerType, containsNull = false) ||
        right.dataType == ArrayType(IntegerType, containsNull = true)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cut_spans requires (string, array<int>), " +
        s"got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = CutSpansExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cut_spans"

  override def nullSafeEval(text: Any, starts: Any): Any =
    CutSpansExpr.cut(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], n, minRun)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => s"""
      ${ev.value} = graft.functions.CutSpansExpr.cut($t, $s, $n, $minRun);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpansExpr =
    copy(left = newLeft, right = newRight)
}

object CutSpansExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_cut_runs", IntegerType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  def cut(text: UTF8String, starts: ArrayData, n: Int, minRun: Int): InternalRow = {
    val toks = text.toString.split("\\s+", -1)
    val nc = starts.numElements()
    val cs = new Array[Int](nc)
    var i = 0
    while (i < nc) { cs(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(cs)
    // Merge overlapping/adjacent-overlapping windows into maximal runs,
    // keeping only runs of extent >= minRun (token-interval endpoints;
    // [s, e) half-open). Qualifying runs land in rs/re.
    val rs = new Array[Int](nc)
    val re = new Array[Int](nc)
    var nr = 0
    var k = 0
    while (k < nc) {
      val s0 = cs(k)
      var e0 = s0 + n
      k += 1
      while (k < nc && cs(k) <= e0) { // chain: next window starts within (or touching) the run
        val e1 = cs(k) + n
        if (e1 > e0) e0 = e1
        k += 1
      }
      if (e0 - s0 >= minRun) { rs(nr) = s0; re(nr) = e0; nr += 1 }
    }
    val sb = new java.lang.StringBuilder
    var kept = 0
    var ri = 0            // next qualifying run to consider
    var coveredUntil = -1 // tokens in [runStart, coveredUntil) are cut
    var runStart = Int.MaxValue
    var t = 0
    while (t < toks.length) {
      while (ri < nr && rs(ri) <= t) {
        runStart = rs(ri); coveredUntil = re(ri); ri += 1
      }
      if (t < runStart || t >= coveredUntil) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(t))
        kept += 1
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length, kept, nr, UTF8String.fromString(sb.toString)))
  }

  def column(text: Column, cutStarts: Column, n: Int): Column =
    call_function("graft_cut_spans", text, cutStarts, lit(n))

  def column(text: Column, cutStarts: Column, n: Int, minRun: Int): Column =
    call_function("graft_cut_spans", text, cutStarts, lit(n), lit(minRun))
}
