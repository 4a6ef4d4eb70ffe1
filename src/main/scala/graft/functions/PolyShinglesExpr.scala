package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_hashes(text)`: the PolyHash of every word-N-gram shingle of
  * the whitespace-tokenized input, as `array<long>`, in ONE pass over the
  * string.
  *
  * Semantically identical to
  * `transform(shingles(split(text, "\\s+"), N), s -> graft_poly_hash(s))`
  * but ~50× faster: higher-order-function lambdas are evaluated interpreted
  * per element (each shingle paid concat + UTF8 conversion + eval overhead);
  * this expression is a single codegen'd call that never materializes the
  * shingle strings. At corpus scale the dedup pipeline's cost is exactly this
  * kernel, so it must stay inside whole-stage codegen.
  *
  * Tokenization parity: `String.split("\\s+", -1)` — the same regex-split
  * semantics as Spark's `split` function (and DuckDB's string_split_regex in
  * the oracle).
  */
case class PolyShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    PolyShinglesExpr.shingleHashes(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyShinglesExpr.shingleHashes($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): PolyShinglesExpr =
    copy(child = newChild)
}

object PolyShinglesExpr {
  /** One-pass kernel: hash of `toks[i] + " " + ... + toks[i+n-1]` for each
    * window, with the identical fold as [[PolyHashExpr.hash]].
    */
  def shingleHashes(s: String, n: Int): ArrayData = {
    val toks = s.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * Hashing.PolyBase + ' '.toInt) % Hashing.PolyMod
        val t = toks(i + j)
        var k = 0
        val len = t.length
        while (k < len) {
          val cp = t.codePointAt(k)
          h = (h * Hashing.PolyBase + cp) % Hashing.PolyMod
          k += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, n: Int): Column = call_function("graft_shingle_hashes", c, lit(n))
}
