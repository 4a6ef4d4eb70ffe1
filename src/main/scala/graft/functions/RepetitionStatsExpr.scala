package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_rep_stats(ws)`: one-pass Gopher-style repetition statistics of a
  * token array — `struct<distinct_ratio: double, top_share: double>` where
  * distinct_ratio = |set(ws)| / |ws| and top_share = max token multiplicity
  * / |ws|. NULL for a NULL or empty array.
  *
  * Replaces the pure-Catalyst HOF form (`array_distinct` + nested
  * `transform(filter(...))`), which is O(distinct·n) per row AND evaluates
  * its lambdas interpreted per element — the corpus-wide cost was ~1.6 s at
  * sf0.1 and grows quadratically with doc length. This is one hash-counting
  * pass per row (O(n)), a single codegen'd call that stays inside the scan's
  * whole-stage-codegen span. Integer-over-integer divisions, so the doubles
  * are the correctly-rounded rationals the HOF form (and the DuckDB oracle)
  * produce — bit-identical output.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType, true) ||
        child.dataType == ArrayType(StringType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats requires array<string>, got ${child.dataType}")

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rep_stats"

  override def nullSafeEval(ws: Any): Any =
    RepetitionStatsExpr.stats(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RepetitionStatsExpr.stats($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("distinct_ratio", DoubleType, nullable = false),
    StructField("top_share", DoubleType, nullable = false)))

  def stats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var maxCount = 0
    var nullCount = 0
    var i = 0
    while (i < n) {
      // SQL array elements can be NULL, and split CAN emit genuine
      // empty-string tokens (leading whitespace) — the two must stay
      // distinct values, so nulls get their own counter instead of a
      // sentinel key that could collide with a real token.
      if (ws.isNullAt(i)) {
        nullCount += 1
        if (nullCount > maxCount) maxCount = nullCount
      } else {
        val c = counts.merge(ws.getUTF8String(i), 1, (a, b) => a + b)
        if (c > maxCount) maxCount = c
      }
      i += 1
    }
    val distinct = counts.size + (if (nullCount > 0) 1 else 0)
    new GenericInternalRow(Array[Any](
      distinct.toDouble / n, maxCount.toDouble / n))
  }

  def column(ws: Column): Column = call_function("graft_rep_stats", ws)
}
