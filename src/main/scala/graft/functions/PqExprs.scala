package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011): split a dim-vector
  * into `m` subvectors and quantize each against a shared codebook — the
  * 100 TB ANN compression step past int8 (dim floats → m byte-sized codes,
  * 64× smaller at dim=64/m=4, and query-time scoring touches only a k×m
  * lookup table instead of the raw vectors).
  *
  * The codebook arrives as ONE flattened array<double> column (label-major:
  * centroid l occupies [l·dim, (l+1)·dim)), produced by a one-row broadcast
  * aggregate — the same bounded-broadcast shape as t5/t6's token totals, so
  * encoding is a zero-shuffle codegen'd map over the corpus. k is inferred
  * from the array lengths (cb.length / vec.length); `m` is a plan-time
  * literal.
  *
  * Cross-engine determinism: every squared L2 is computed as
  * a·a + c·c − 2·a·c with each dot product summed in index order — exactly
  * DuckDB's `list_dot_product` evaluation — then rounded half-up to 6 dp
  * (the BigDecimal path Catalyst's `round()` uses), so distances, argmins,
  * and therefore codes agree bit-for-bit with the SQL oracle.
  */
object PqExprs {

  private def round6(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  val encodeSchema: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err", DoubleType, nullable = false)))

  /** Rounded squared L2 between subvector s of v and centroid l's
    * subvector s in the flattened codebook.
    */
  private def subDist(v: ArrayData, cb: ArrayData, dim: Int, sub: Int,
      s: Int, l: Int): Double = {
    val base = s * sub
    val cbase = l * dim + base
    var aa = 0.0; var cc = 0.0; var ac = 0.0
    var i = 0
    while (i < sub) {
      val x = v.getDouble(base + i)
      val c = cb.getDouble(cbase + i)
      aa += x * x; cc += c * c; ac += x * c
      i += 1
    }
    round6(aa + cc - 2 * ac)
  }

  /** codes[s] = argmin over centroids of the rounded sub-distance (ties →
    * lower centroid id); err = rounded √(Σ_s best d²). Null on shape
    * mismatch (dim not divisible by m, codebook not a multiple of dim).
    */
  def encode(v: ArrayData, cb: ArrayData, m: Int): InternalRow = {
    val dim = v.numElements()
    if (dim == 0 || m <= 0 || dim % m != 0) return null
    if (cb.numElements() == 0 || cb.numElements() % dim != 0) return null
    val k = cb.numElements() / dim
    val sub = dim / m
    val codes = new Array[Any](m)
    var errSum = 0.0
    var s = 0
    while (s < m) {
      var bestD2 = Double.PositiveInfinity
      var bestL = -1
      var l = 0
      while (l < k) {
        val d2 = subDist(v, cb, dim, sub, s, l)
        if (d2 < bestD2) { bestD2 = d2; bestL = l }
        l += 1
      }
      codes(s) = bestL
      errSum += bestD2
      s += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes), round6(math.sqrt(errSum))))
  }

  /** Asymmetric-distance lookup table for a query vector: entry l·m + s =
    * rounded d²(q_s, centroid l's subvector s). k·m doubles per query —
    * the only thing ADC scoring touches per candidate.
    */
  def distTable(v: ArrayData, cb: ArrayData, m: Int): ArrayData = {
    val dim = v.numElements()
    if (dim == 0 || m <= 0 || dim % m != 0) return null
    if (cb.numElements() == 0 || cb.numElements() % dim != 0) return null
    val k = cb.numElements() / dim
    val sub = dim / m
    val out = new Array[Any](k * m)
    var l = 0
    while (l < k) {
      var s = 0
      while (s < m) {
        out(l * m + s) = subDist(v, cb, dim, sub, s, l)
        s += 1
      }
      l += 1
    }
    new GenericArrayData(out)
  }

  /** Residual of `v` against centroid `cell` of the flattened codebook:
    * out[i] = v[i] − cb[cell·dim + i]. The IVFADC build/query kernel
    * (Jégou et al. 2011 §IV): PQ codes over residuals, not raw vectors —
    * residual energy is a fraction of vector energy, so the same code
    * budget quantizes much finer. Plain IEEE subtraction, no rounding:
    * bit-identical in any engine that subtracts the same doubles.
    */
  def residual(v: ArrayData, cb: ArrayData, cell: Int): ArrayData = {
    val dim = v.numElements()
    if (dim == 0 || cb.numElements() == 0 || cb.numElements() % dim != 0) return null
    if (cell < 0 || cell >= cb.numElements() / dim) return null
    val base = cell * dim
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) { out(i) = v.getDouble(i) - cb.getDouble(base + i); i += 1 }
    new GenericArrayData(out)
  }

  def encodeColumn(v: Column, cb: Column, m: Int): Column =
    call_function("graft_pq_encode", v, cb, lit(m))

  def distTableColumn(v: Column, cb: Column, m: Int): Column =
    call_function("graft_pq_dist_table", v, cb, lit(m))

  def residualColumn(v: Column, cb: Column, cell: Column): Column =
    call_function("graft_pq_residual", v, cb, cell)

  private[functions] def checkArgs(v: Expression, cb: Expression,
      name: String): TypeCheckResult = {
    val ok = Seq(v, cb).forall(e =>
      e.dataType == ArrayType(DoubleType, true) ||
        e.dataType == ArrayType(DoubleType, false))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires (array<double>, array<double>), " +
        s"got (${v.dataType}, ${cb.dataType})")
  }
}

case class PqEncodeExpr(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.checkArgs(left, right, prettyName)
  override def dataType: DataType = PqExprs.encodeSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqExprs.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => s"""
      ${ev.value} = graft.functions.PqExprs.encode($v, $cb, $m);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

case class PqDistTableExpr(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.checkArgs(left, right, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_dist_table"

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqExprs.distTable(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => s"""
      ${ev.value} = graft.functions.PqExprs.distTable($v, $cb, $m);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDistTableExpr =
    copy(left = newLeft, right = newRight)
}

case class PqResidualExpr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.checkArgs(first, second, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess if third.dataType == IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case TypeCheckResult.TypeCheckSuccess =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName cell must be INT, got ${third.dataType}")
      case fail => fail
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_residual"

  override def nullSafeEval(v: Any, cb: Any, cell: Any): Any =
    PqExprs.residual(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, cell) => s"""
      ${ev.value} = graft.functions.PqExprs.residual($v, $cb, $cell);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqResidualExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
