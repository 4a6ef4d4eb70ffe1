package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003) as
  * native one-pass kernels: the distinct minima of every window of `w`
  * consecutive word-n-gram hashes.
  *
  * `graft_winnow(text, n, w)` → `array<long>` (distinct fingerprints,
  * first-appearance order); `graft_winnow_stats(text, n, w)` →
  * `struct<n_shingles int, n_fp int, xor_fp long>` — the per-doc gate
  * columns in ONE codegen'd call.
  *
  * The HOF spelling (`transform(sequence(...), i -> array_min(slice(...)))`)
  * evaluates an interpreted lambda per WINDOW with an O(w) slice each —
  * O(len·w) interpreted work per doc; these kernels run the classic
  * monotonic-deque sliding minimum, O(len) total, inside whole-stage
  * codegen (the PlanAudit no-hot-lambda rule).
  */
case class WinnowExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    WinnowExpr.checkArgs("graft_winnow", child, n, w)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.fingerprints(input.asInstanceOf[UTF8String].toString, n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowExpr.fingerprints($c.toString(), $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

case class WinnowStatsExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    WinnowExpr.checkArgs("graft_winnow_stats", child, n, w)
  override def dataType: DataType = WinnowExpr.statsType
  override def prettyName: String = "graft_winnow_stats"

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.stats(input.asInstanceOf[UTF8String].toString, n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowExpr.stats($c.toString(), $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowStatsExpr =
    copy(child = newChild)
}

/** `graft_winnow_fps(text, n, w)` → `struct<n_shingles int,
  * fps array<long>>`: one hash pass serving BOTH the shingle count and
  * the fingerprint set (two separate kernel calls would tokenize + hash
  * the text twice — the dominant per-row cost on a map-only corpus pass).
  */
case class WinnowFpsExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    WinnowExpr.checkArgs("graft_winnow_fps", child, n, w)
  override def dataType: DataType = WinnowExpr.fpsType
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.fpsStruct(input.asInstanceOf[UTF8String].toString, n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowExpr.fpsStruct($c.toString(), $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

object WinnowExpr {

  private[functions] def checkArgs(name: String, child: Expression,
      n: Int, w: Int): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$name requires a string argument, got ${child.dataType}")
    else if (n < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$name requires n >= 1 and w >= 1, got n=$n w=$w")
    else TypeCheckResult.TypeCheckSuccess

  val statsType: StructType = StructType(Seq(
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("n_fp", IntegerType, nullable = false),
    StructField("xor_fp", LongType, nullable = false)))

  val fpsType: StructType = StructType(Seq(
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("fps", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Distinct per-window minima of the shingle-hash sequence, O(len) via a
    * monotonic deque; empty when the doc has fewer than `w` shingles.
    */
  private def winnowed(hs: Array[Long], w: Int): Array[Long] = {
    if (hs.length < w) return Array.empty[Long]
    val deque = new Array[Int](hs.length) // indices, increasing hash values
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](hs.length - w + 1)
    var i = 0
    while (i < hs.length) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hs(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    out.toArray
  }

  private def hashesOf(s: String, n: Int): Array[Long] = {
    val arr = PolyShinglesExpr.shingleHashes(s, n)
    arr.asInstanceOf[GenericArrayData].toLongArray()
  }

  def fingerprints(s: String, n: Int, w: Int): ArrayData =
    new GenericArrayData(winnowed(hashesOf(s, n), w))

  /** (n_shingles, n_fp, xor_fp) in one pass — the t20 gate columns. */
  def stats(s: String, n: Int, w: Int): InternalRow = {
    val hs = hashesOf(s, n)
    val fps = winnowed(hs, w)
    var x = 0L
    var i = 0
    while (i < fps.length) { x ^= fps(i); i += 1 }
    new GenericInternalRow(Array[Any](hs.length, fps.length, x))
  }

  /** (n_shingles, fps) from ONE hash pass — the [[WinnowFpsExpr]] kernel. */
  def fpsStruct(s: String, n: Int, w: Int): InternalRow = {
    val hs = hashesOf(s, n)
    new GenericInternalRow(Array[Any](hs.length,
      new GenericArrayData(winnowed(hs, w))))
  }

  def column(c: Column, n: Int, w: Int): Column =
    call_function("graft_winnow", c, lit(n), lit(w))
  def statsColumn(c: Column, n: Int, w: Int): Column =
    call_function("graft_winnow_stats", c, lit(n), lit(w))
  def fpsColumn(c: Column, n: Int, w: Int): Column =
    call_function("graft_winnow_fps", c, lit(n), lit(w))
}
