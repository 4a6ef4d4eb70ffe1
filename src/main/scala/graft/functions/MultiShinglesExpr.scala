package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_multi_shingle_hashes(text, "n1,n2,…")`: the [[PolyShinglesExpr]]
  * shingle hashes for SEVERAL window widths in ONE pass over the string,
  * each packed as `(n << 32) | hash` in a single `array<long>` (PolyMod <
  * 2^30, so the hash never reaches the tag bits).
  *
  * The multi-n sweep is the practical step toward exact-substring dedup
  * (Lee et al. 2022): one fixed n is a single operating point, a sweep
  * bounds the verbatim-run length from several. Running [[PolyShinglesExpr]]
  * once per n would re-tokenize and re-traverse every character per width —
  * at corpus scale, the dominant cost. Here the char-level work happens once
  * (per-token hash `th` and codepoint-length power `pw = B^cpLen` in a
  * single pass); each width's windows then fold precomputed per-TOKEN pairs
  * (`h' = (h·B + ' ')·pw + th`), so extra widths cost integer ops, never
  * another string traversal.
  *
  * Same tokenization as [[PolyShinglesExpr]] (`split("\\s+", -1)`) and the
  * identical per-window fold — `multiShingleHashes(s, Array(n))` equals
  * `shingleHashes(s, n)` with the tag stripped (asserted in DedupTextSpec).
  */
case class MultiShinglesExpr(child: Expression, ns: Seq[Int]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_multi_shingle_hashes requires a string argument, got ${child.dataType}")
    else if (ns.isEmpty || ns.exists(_ <= 0))
      TypeCheckResult.TypeCheckFailure(
        "graft_multi_shingle_hashes requires at least one positive window width")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    MultiShinglesExpr.multiShingleHashes(
      input.asInstanceOf[UTF8String].toString, ns.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", ns.toArray, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MultiShinglesExpr.multiShingleHashes($c.toString(), $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiShinglesExpr =
    copy(child = newChild)
}

object MultiShinglesExpr {
  /** One string pass for every width: tokenize once, per-token
    * `(hash, B^cpLen)` once, then each width's windows fold token pairs.
    */
  def multiShingleHashes(s: String, ns: Array[Int]): ArrayData = {
    val toks = s.split("\\s+", -1)
    val m = toks.length
    val th = new Array[Long](m)
    val pw = new Array[Long](m)
    var t = 0
    while (t < m) {
      val tok = toks(t)
      var h = 0L
      var p = 1L
      var k = 0
      val len = tok.length
      while (k < len) {
        val cp = tok.codePointAt(k)
        h = (h * Hashing.PolyBase + cp) % Hashing.PolyMod
        p = (p * Hashing.PolyBase) % Hashing.PolyMod
        k += Character.charCount(cp)
      }
      th(t) = h
      pw(t) = p
      t += 1
    }
    var total = 0
    var q = 0
    while (q < ns.length) {
      if (m >= ns(q)) total += m - ns(q) + 1
      q += 1
    }
    val out = new Array[Long](total)
    var o = 0
    q = 0
    while (q < ns.length) {
      val n = ns(q)
      val tag = n.toLong << 32
      var i = 0
      while (i + n <= m) {
        var h = 0L
        var j = 0
        while (j < n) {
          val idx = i + j
          // Append " tok": shift in the separator, then the whole token via
          // its precomputed hash/power (h·pw + th ≡ folding each codepoint).
          if (j > 0) h = (h * Hashing.PolyBase + ' '.toInt) % Hashing.PolyMod
          h = (h * pw(idx) + th(idx)) % Hashing.PolyMod
          j += 1
        }
        out(o) = tag | h
        o += 1
        i += 1
      }
      q += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, ns: Seq[Int]): Column =
    call_function("graft_multi_shingle_hashes", c, lit(ns.mkString(",")))
}
