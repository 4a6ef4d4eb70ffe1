package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `graft_int8_quantize(v)`: one-pass int8 scalar quantization summary of an
  * `array<double>` vector — the 100 TB ANN memory/IO trick (q_i =
  * ⌊x_i·127/max|x| + 0.5⌋ stores a vector in dim bytes instead of 4·dim).
  *
  * Returns `struct<qnorm2: bigint, err: double, amax: double>` where qnorm2
  * is the exact integer ‖q‖² (cross-engine bit-for-bit witness), err the
  * reconstruction-error L2 norm, and amax the scale; NULL when max|x| ≤ 0
  * (an all-zero vector has no scale). Replaces the posexplode → amax-join →
  * re-aggregate shape, which shuffled dim× the row count twice: this is a
  * single codegen'd call per row — zero exchanges, stays inside the scan's
  * whole-stage-codegen span.
  *
  * Two passes over the in-memory array (amax, then sums) — same sequential
  * summation order as the exploded aggregate it replaces, so the 6-dp
  * rounded err matches the DuckDB oracle unchanged.
  */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(DoubleType, true) ||
        child.dataType == ArrayType(DoubleType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int8_quantize requires array<double>, got ${child.dataType}")

  override def dataType: DataType = Int8QuantizeExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_quantize"

  override def nullSafeEval(v: Any): Any =
    Int8QuantizeExpr.quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Int8QuantizeExpr.quantize($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Int8QuantizeExpr =
    copy(child = c)
}

object Int8QuantizeExpr {
  val schema: StructType = StructType(Seq(
    StructField("qnorm2", LongType, nullable = false),
    StructField("err", DoubleType, nullable = false),
    StructField("amax", DoubleType, nullable = false)))

  def quantize(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      // A null element poisons the whole vector (the oracle's semantics:
      // NULL propagates through list_transform/list_max and the row drops
      // at the amax filter) — without this check getDouble on a safe row
      // NPEs and on an unsafe row silently reads 0.0 (ADVICE r17).
      if (v.isNullAt(i)) return null
      val a = math.abs(v.getDouble(i))
      if (a > amax) amax = a
      i += 1
    }
    if (amax <= 0) return null
    var qnorm2 = 0L
    var err2 = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val q = math.floor(x * 127.0 / amax + 0.5)
      qnorm2 += (q * q).toLong
      val d = x - q * amax / 127.0
      err2 += d * d
      i += 1
    }
    new GenericInternalRow(Array[Any](qnorm2, math.sqrt(err2), amax))
  }

  def column(v: Column): Column = call_function("graft_int8_quantize", v)
}

/** `graft_int8_codes(v)`: the int8 code VECTOR itself — q_i =
  * ⌊x_i·127/max|x| + 0.5⌋ as `array<int>`, NULL when max|x| ≤ 0. The
  * storage form SQ8 search ranks on (v28); [[Int8QuantizeExpr]] is the
  * summary twin. Same single codegen'd call per row: no posexplode, no
  * per-element lambda, stays inside the scan's whole-stage-codegen span.
  */
case class Int8CodesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(DoubleType, true) ||
        child.dataType == ArrayType(DoubleType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int8_codes requires array<double>, got ${child.dataType}")

  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_codes"

  override def nullSafeEval(v: Any): Any =
    Int8CodesExpr.codes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Int8CodesExpr.codes($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Int8CodesExpr =
    copy(child = c)
}

object Int8CodesExpr {
  def codes(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      // Same null-element contract as [[Int8QuantizeExpr.quantize]]: a null
      // slot yields a NULL result, matching the oracle's NULL propagation.
      if (v.isNullAt(i)) return null
      val a = math.abs(v.getDouble(i))
      if (a > amax) amax = a
      i += 1
    }
    if (amax <= 0) return null
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * 127.0 / amax + 0.5).toInt
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def column(v: Column): Column = call_function("graft_int8_codes", v)
}
