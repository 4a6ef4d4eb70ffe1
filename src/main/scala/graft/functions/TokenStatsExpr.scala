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

/** `graft_token_stats(ws)`: one-pass curation statistics of a token array —
  * `struct<len_sum: bigint, stop_hits: int, en: int, de: int, es: int,
  * fr: int>` where len_sum is the total character count, stop_hits the
  * stopword hits ([[graft.ops.TextOps.Stopwords]]) and en/de/es/fr the
  * language-marker hits ([[graft.ops.TextOps.LangMarkers]]). NULL for a
  * NULL array; NULL elements contribute nothing (0 length, no hits).
  *
  * Replaces the HOF spellings (`filter(ws, array_contains(...))` per
  * word list + `aggregate(ws, 0, acc + length(w))`) used by the quality /
  * language-ID operators: those evaluate per-element lambdas interpreted
  * AND re-walk the token array once per word list — six interpreted array
  * passes per document on the corpus-wide hot path. This is one codegen'd
  * O(n) pass with a shared static token→category bitmask.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType, true) ||
        child.dataType == ArrayType(StringType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_stats requires array<string>, got ${child.dataType}")

  override def dataType: DataType = TokenStatsExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_stats"

  override def nullSafeEval(ws: Any): Any =
    TokenStatsExpr.stats(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TokenStatsExpr.stats($c);
    """)

  override protected def withNewChildInternal(c: Expression): TokenStatsExpr =
    copy(child = c)
}

object TokenStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("len_sum", LongType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false)))

  private val STOP = 1
  private val EN = 2
  private val DE = 4
  private val ES = 8
  private val FR = 16

  /** token → category bitmask (a token can be both a stopword and a
    * language marker). Built once from the TextOps word lists so the two
    * spellings can never drift apart.
    */
  private val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    def add(words: Seq[String], bit: Int): Unit = words.foreach { w =>
      val k = UTF8String.fromString(w)
      m.merge(k, Integer.valueOf(bit), (a, b) => Integer.valueOf(a | b)); ()
    }
    add(graft.ops.TextOps.Stopwords, STOP)
    add(graft.ops.TextOps.LangMarkers("en"), EN)
    add(graft.ops.TextOps.LangMarkers("de"), DE)
    add(graft.ops.TextOps.LangMarkers("es"), ES)
    add(graft.ops.TextOps.LangMarkers("fr"), FR)
    m
  }

  def stats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    var lenSum = 0L
    var stop = 0; var en = 0; var de = 0; var es = 0; var fr = 0
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val w = ws.getUTF8String(i)
        lenSum += w.numChars()
        val m = masks.get(w)
        if (m != null) {
          val b = m.intValue()
          if ((b & STOP) != 0) stop += 1
          if ((b & EN) != 0) en += 1
          if ((b & DE) != 0) de += 1
          if ((b & ES) != 0) es += 1
          if ((b & FR) != 0) fr += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](lenSum, stop, en, de, es, fr))
  }

  def column(ws: Column): Column = call_function("graft_token_stats", ws)
}
