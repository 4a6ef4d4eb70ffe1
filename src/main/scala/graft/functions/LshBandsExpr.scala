package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lsh_bands(text, n, k, bands)`: the full MinHash-LSH bucket keys of
  * one document in ONE per-row pass — shingle hashes → k permutation mins →
  * per-band polynomial fold — returning `array<long>` of `bands` band keys
  * (null when the text has no n-token shingle, matching the batch path
  * where such docs simply produce no signature row).
  *
  * The batch pipeline (ops/Dedup.scala) computes the same values via
  * explode → groupBy — the right shape for a corpus-wide pass (map-side
  * partial mins, shuffle carries 16 longs/doc). This expression is the
  * STREAMING form: a delta stream cannot run an unbounded groupBy without
  * watermark state, but per-row evaluation needs none — the signature is a
  * pure function of the text. Bit-identical to the batch path by
  * construction (same PolyShinglesExpr kernel, same Hashing constants, same
  * band fold; DedupTextSpec asserts equality).
  */
case class LshBandsExpr(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bands"

  override def nullSafeEval(input: Any): Any =
    LshBandsExpr.bandKeys(input.asInstanceOf[UTF8String].toString, n, k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.LshBandsExpr.bandKeys($c.toString(), $n, $k, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): LshBandsExpr =
    copy(child = newChild)
}

object LshBandsExpr {
  /** One-pass kernel; null when the doc has no n-token shingle. */
  def bandKeys(s: String, n: Int, k: Int, bands: Int): ArrayData = {
    val hs = PolyShinglesExpr.shingleHashes(s, n)
    val m = hs.numElements()
    if (m == 0) return null
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        // h < PolyMod (~1e9), permA < 2e9: the product stays in i64.
        val v = Math.floorMod(h * Hashing.permA(j) + Hashing.permB(j),
          Hashing.PolyMod)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val rows = k / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) {
        acc = Math.floorMod(acc * Hashing.PolyBase + sig(b * rows + r),
          Hashing.PolyMod)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def column(text: Column, n: Int, k: Int, bands: Int): Column =
    call_function("graft_lsh_bands", text, lit(n), lit(k), lit(bands))
}
