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

/** `graft_cut_spans(text, cut_starts, n)`: remove every n-token window
  * starting at the given 0-based token positions from the whitespace-token
  * stream of `text`, merging overlapping windows, and return
  * `struct<n_tokens int, n_kept int, cleaned string>` — the per-row rewrite
  * kernel of exact-substring span removal (ops/Dedup.cutSpans).
  *
  * A HOF spelling (`filter(ws, (w, i) -> !exists(cuts, c -> ...))`) is
  * semantically identical but evaluates an interpreted lambda per token ×
  * per cut — the t9 failure mode on a corpus-scale scan, and O(T·C) per
  * doc besides. This kernel is one codegen'd call, O(T + C log C): sort
  * the cut starts once, sweep the tokens against the merged intervals.
  *
  * Tokenization parity: `String.split("\\s+", -1)` — identical to Spark's
  * `split` and DuckDB's `string_split_regex` (same contract as
  * [[PolyShinglesExpr]], whose positions the cut starts come from).
  */
case class CutSpansExpr(left: Expression, right: Expression, n: Int)
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
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => s"""
      ${ev.value} = graft.functions.CutSpansExpr.cut($t, $s, $n);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpansExpr =
    copy(left = newLeft, right = newRight)
}

object CutSpansExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  def cut(text: UTF8String, starts: ArrayData, n: Int): InternalRow = {
    val toks = text.toString.split("\\s+", -1)
    val nc = starts.numElements()
    val cs = new Array[Int](nc)
    var i = 0
    while (i < nc) { cs(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(cs)
    val sb = new java.lang.StringBuilder
    var kept = 0
    var ci = 0            // next cut interval to consider
    var coveredUntil = 0  // tokens < coveredUntil are cut
    var t = 0
    while (t < toks.length) {
      while (ci < nc && cs(ci) <= t) {
        val end = cs(ci) + n
        if (end > coveredUntil) coveredUntil = end
        ci += 1
      }
      if (t >= coveredUntil) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(t))
        kept += 1
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length, kept, UTF8String.fromString(sb.toString)))
  }

  def column(text: Column, cutStarts: Column, n: Int): Column =
    call_function("graft_cut_spans", text, cutStarts, lit(n))
}
