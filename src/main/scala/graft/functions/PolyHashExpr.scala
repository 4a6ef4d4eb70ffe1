package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native polynomial rolling string hash:
  * `h = fold(codepoints(s), 0)((h, c) => (h * 31 + c) mod 1e9+7)`.
  *
  * Used as the shingle/word hash for MinHash-LSH dedup and document
  * fingerprinting. A native expression with codegen keeps the dedup path
  * inside whole-stage codegen (a Scala UDF would break the codegen span and
  * pay serialization per row; `aggregate(split(s,''))` builds a per-row array
  * of single-char strings — allocation-heavy at 100 TB).
  *
  * Cross-engine contract: identical to the DuckDB SQL produced by
  * [[Hashing.polyHashSql]] for any string (iterates unicode codepoints).
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    PolyHashExpr.hash(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  /** JVM-side kernel; called from both interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * Hashing.PolyBase + cp) % Hashing.PolyMod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column handle via the registered SQL function (see [[Functions]]). */
  def column(c: Column): Column = call_function("graft_poly_hash", c)
}
