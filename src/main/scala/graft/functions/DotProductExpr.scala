package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(a, b)`: sequential left-to-right dot product of two
  * `array<double>` columns (length = min of the two).
  *
  * The similarity operators' hot kernel. `aggregate(zip_with(a,b,*),+)` is
  * semantically identical but its lambdas run interpreted per element —
  * ~25M interpreted evals for one IVF cell join at sf0.1. This expression is
  * one codegen'd call; summation order matches the HOF form and DuckDB's
  * list_dot_product, so oracle-rounded results are unchanged.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, true) ||
        left.dataType == ArrayType(DoubleType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> arguments, got ${left.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProductExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

object DotProductExpr {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def column(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
