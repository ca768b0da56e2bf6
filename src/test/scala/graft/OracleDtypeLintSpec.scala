package graft

import scala.collection.mutable

/** Systemic guard for the DuckDB↔Spark oracle dtype bug class.
  *
  * Three rounds in a row an oracle-side type artifact cost a green query:
  * round-1 q21 (`epoch()` is DOUBLE in DuckDB vs BIGINT `unix_timestamp`),
  * round-2 q64/q66/q78/q87 (DuckDB `sum()` over integers yields HUGEINT,
  * which pandas materializes as float64 while Spark emits int64 — values
  * equal, `123.0 != 123` under the driver's exact sorted-values hash).
  *
  * This spec statically lints every `SparkEntry.oracleSql`: any integer-
  * capable aggregate (`sum`, `list_sum`, `epoch`) whose value can reach a
  * column of the FINAL output without passing through an explicit
  * `CAST(...)`/`round(...)` fails the build. "Reach the output" is decided
  * by a small alias-taint propagation: a bare aggregate taints its direct
  * alias; a tainted identifier used in arithmetic (`+ - * / % & | ^ >> <<`)
  * or re-aliased taints the new alias; comparisons (`> < = !=`) do NOT
  * propagate (boolean results carry no dtype hazard); scalar subqueries
  * `(SELECT sum(...))` are flagged outright (their value is always consumed,
  * the exact round-2 q78 shape). Output columns come from the Spark query's
  * analyzed schema, so the lint needs no DuckDB at build time — the
  * empirical dtype check lives in tools/check.py (dtype-mismatch = FAIL).
  */
class OracleDtypeLintSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  /** Blank out single-quoted literal contents so regex/paren scans can't be
    * confused by parens or keywords inside string literals. */
  private def blankLiterals(sql: String): String = {
    val sb = new StringBuilder(sql)
    var in = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == '\'') in = !in
      else if (in) sb.setCharAt(i, ' ')
      i += 1
    }
    sb.toString
  }

  /** Names of calls lexically enclosing position `idx`, innermost first;
    * "" for bare (non-call) parens. */
  private def enclosing(sql: String, idx: Int): Seq[String] = {
    val out = mutable.Buffer[String]()
    var depth = 0
    var i = idx - 1
    while (i >= 0) {
      sql.charAt(i) match {
        case ')'              => depth += 1
        case '(' if depth > 0 => depth -= 1
        case '(' =>
          var j = i - 1
          while (j >= 0 && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j -= 1
          out += sql.substring(j + 1, i).toLowerCase
        case _ =>
      }
      i -= 1
    }
    out.toSeq
  }

  /** Index of the ')' matching the '(' at `open`, or -1. */
  private def closeParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _   =>
      }
      i += 1
    }
    -1
  }

  /** Alias of the select-item expression continuing at `pos` (just past an
    * aggregate's closing paren or a tainted identifier): skips an optional
    * OVER (...) clause and chains of arithmetic `op operand`, then expects
    * `AS <ident>`. Returns None on comparisons, item end (`,`/FROM/...), or
    * anything unparseable — callers treat None as "does not reach an alias".
    */
  private def aliasAfterExpr(sql: String, pos: Int): Option[String] = {
    var i = pos
    def skipWs(): Unit = while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    def skipOperand(): Boolean = {
      skipWs()
      if (i >= sql.length) false
      else if (sql.charAt(i) == '(') { i = closeParen(sql, i); if (i < 0) false else { i += 1; true } }
      else {
        val s = i
        while (i < sql.length &&
          (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' || sql.charAt(i) == '.')) i += 1
        // a consumed operand may itself be a function call
        skipWs()
        if (i < sql.length && sql.charAt(i) == '(' && i > s) {
          i = closeParen(sql, i); if (i < 0) return false; i += 1
        }
        i > s
      }
    }
    var continue = true
    while (continue) {
      skipWs()
      if (i >= sql.length) return None
      if (sql.regionMatches(true, i, "OVER", 0, 4) &&
          (i + 4 >= sql.length || !sql.charAt(i + 4).isLetterOrDigit)) {
        i += 4; skipWs()
        if (i < sql.length && sql.charAt(i) == '(') {
          i = closeParen(sql, i); if (i < 0) return None; i += 1
        }
      } else if (sql.regionMatches(true, i, "AS", 0, 2) &&
          i + 2 < sql.length && sql.charAt(i + 2).isWhitespace) {
        i += 3; skipWs()
        if (i < sql.length && sql.charAt(i) == '"') {
          val s = i + 1
          var j = s
          while (j < sql.length && sql.charAt(j) != '"') j += 1
          return Some(sql.substring(s, j).toLowerCase)
        }
        val s = i
        while (i < sql.length && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        return if (i > s) Some(sql.substring(s, i).toLowerCase) else None
      } else if (sql.startsWith(">>", i) || sql.startsWith("<<", i)) {
        i += 2; if (!skipOperand()) return None
      } else if ("<>=!".contains(sql.charAt(i))) {
        return None // comparison: boolean result, no dtype hazard propagates
      } else if ("+-*/%&|^".contains(sql.charAt(i))) {
        i += 1
        if (i < sql.length && sql.charAt(i) == '/') i += 1 // `//` int division
        if (!skipOperand()) return None
      } else if (sql.charAt(i) == ')') {
        // exiting a paren group: step past bare grouping parens (the value
        // escapes, e.g. `(t + 1) AS x`), stop at function-call parens (the
        // function's own return type governs, e.g. `bit_count(.. t ..)`).
        var depth = 0
        var j = i - 1
        var open = -1
        while (j >= 0 && open < 0) {
          sql.charAt(j) match {
            case ')'              => depth += 1
            case '(' if depth > 0 => depth -= 1
            case '('              => open = j
            case _                =>
          }
          j -= 1
        }
        if (open < 0) return None
        var k = open - 1
        while (k >= 0 && (sql.charAt(k).isLetterOrDigit || sql.charAt(k) == '_')) k -= 1
        val fn = sql.substring(k + 1, open)
        if (fn.isEmpty) i += 1 else return None
      } else {
        continue = false
      }
    }
    None
  }

  /** Outermost NAMED call lexically enclosing `idx` (skipping bare parens),
    * as (name, openParenIdx), or None. */
  private def outermostCall(sql: String, idx: Int): Option[(String, Int)] = {
    var depth = 0
    var i = idx - 1
    var last: Option[(String, Int)] = None
    while (i >= 0) {
      sql.charAt(i) match {
        case ')'              => depth += 1
        case '(' if depth > 0 => depth -= 1
        case '(' =>
          var j = i - 1
          while (j >= 0 && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j -= 1
          val name = sql.substring(j + 1, i).toLowerCase
          if (name.nonEmpty) last = Some((name, i))
        case _ =>
      }
      i -= 1
    }
    last
  }

  test("transcendental outputs are pinned at the source (round-6 class guard)") {
    // The q303 lesson: JVM Math.log and libm ln are each correctly-rounded
    // to within 1 ulp but NOT to the SAME ulp, so a transcendental's raw
    // double may differ between Spark and DuckDB. Any such value that
    // crosses a select-item alias UNPINNED and later reaches an output
    // column is a latent hash-miss — even when the use site wraps it in
    // round(...): rounding two inputs that differ by 1 ulp can land on
    // opposite sides of a half-way boundary (exactly how q303 went red in
    // round 6). The pinned-constant pattern: quantize AT THE SOURCE —
    // round(ln(x), 6) / floor(log2(x)) / CAST(power(2, k) AS BIGINT) —
    // after which both engines hold the identical double and all further
    // +,-,*,/ in identical association order are IEEE correctly-rounded,
    // i.e. bit-identical by construction.
    // sqrt/cbrt are exempt: IEEE requires correct rounding for those.
    val violations = mutable.Buffer[String]()
    for ((name, rawSql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      if (TransRe.findFirstIn(rawSql).isDefined) {
        val outCols = SparkEntry.queries(name)(spark, SfDir)
          .schema.fieldNames.map(_.toLowerCase).toSet
        violations ++= transcendentalViolations(name, rawSql, outCols)
      }
    }
    assert(violations.isEmpty,
      "\ntranscendental pin lint violations:\n" + violations.mkString("\n"))
  }

  test("transcendental pin lint catches the round-6 q303 spelling (regression)") {
    // The exact shape that went red in CORRECTNESS_r06: ln() crosses the
    // score_raw alias unpinned, and round(score_raw, 6) at the USE site
    // does not absorb the ln ulp slack. The lint must stay red on it.
    val oldQ303 =
      """WITH sc AS (SELECT doc_id,
        |    ln((CAST(n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5))
        |      * (CAST(tf0 AS DOUBLE) * 2.2)
        |      / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * len
        |        / (CAST(sl AS DOUBLE) / n))) AS score_raw
        |  FROM t, st)
        |SELECT doc_id, round(score_raw, 6) AS score
        |FROM sc ORDER BY score_raw DESC, doc_id LIMIT 20""".stripMargin
    val v = transcendentalViolations("old_q303", oldQ303, Set("doc_id", "score"))
    assert(v.exists(_.contains("'score'")),
      s"lint failed to flag the old q303 spelling; got: $v")
    // and the pinned spelling is clean: round(ln(·), 6) quantizes at source
    val pinned =
      """SELECT doc_id,
        |  round(ln((CAST(n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5)), 6)
        |    * CAST(tf0 * 22 * sl AS DOUBLE)
        |    / CAST(tf0 * 10 * sl + 3 * sl + 9 * len * n AS DOUBLE) AS score
        |FROM t""".stripMargin
    assert(transcendentalViolations("new_q303", pinned, Set("doc_id", "score")).isEmpty)
  }

  private val TransRe = "(?i)(?<![a-z0-9_])(ln|log|log2|log10|exp|pow|power)\\s*\\(".r
  private val Pinning = Set("round", "floor", "ceil", "ceiling", "cast")

  private def transcendentalViolations(
      name: String, rawSql: String, outCols: Set[String]): Seq[String] = {
    val sql = blankLiterals(rawSql)
    val tainted = mutable.Set[String]()

    // seed: unpinned transcendental → the alias its select item binds
    for (m <- TransRe.findAllMatchIn(sql)) {
      if (!enclosing(sql, m.start).exists(Pinning)) {
        // jump past the outermost enclosing named call if any (its value
        // carries the slack: sum(t*ln(x)) is as tainted as ln(x) itself)
        val from = outermostCall(sql, m.start) match {
          case Some((_, open)) => closeParen(sql, open) + 1
          case None =>
            val open = sql.indexOf('(', m.start)
            closeParen(sql, open) + 1
        }
        if (from > 0) aliasAfterExpr(sql, from) match {
          case Some(a) => tainted += a
          case None    => // no alias: value dies in a comparison/filter —
                          // boolean results carry no emitted-dtype hazard
        }
      }
    }

    // propagate: tainted id → its select-item alias; round/cast at the
    // USE site do NOT clear transcendental slack (the old-q303 shape),
    // so jump past any enclosing call and re-alias unconditionally
    var changed = true
    var rounds = 0
    while (changed && rounds < 6) {
      changed = false; rounds += 1
      for (t <- tainted.toSeq) {
        val idRe = s"(?i)(?<![a-z0-9_])${java.util.regex.Pattern.quote(t)}(?![a-z0-9_])".r
        for (m <- idRe.findAllMatchIn(sql)) {
          val from = outermostCall(sql, m.start) match {
            case Some((_, open)) => closeParen(sql, open) + 1
            case None            => m.end
          }
          if (from > 0) aliasAfterExpr(sql, from).foreach { a =>
            if (!tainted.contains(a)) { tainted += a; changed = true }
          }
        }
      }
    }

    (for (t <- tainted.toSeq.sorted if outCols.contains(t))
      yield s"$name: output column '$t' carries an UNPINNED transcendental " +
        "(JVM vs libm ulp slack crosses an alias before quantization — " +
        "pin at source: round(ln(x), 6), then exact arithmetic downstream)")
  }

  test("oracle integer aggregates reaching the output are explicitly CAST") {
    val aggRe = "(?i)(?<![a-z0-9_])(sum|list_sum|epoch)\\s*\\(".r
    val violations = mutable.Buffer[String]()

    for ((name, rawSql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val sql = blankLiterals(rawSql)
      // construct each query ONCE — some builders are eager (q88 runs its
      // sized write at construction), so a second build doubles side effects
      val schemaFields = SparkEntry.queries(name)(spark, SfDir)
        .schema.fieldNames.map(_.toLowerCase)
      val outCols = schemaFields.toSet
      val tainted = mutable.Set[String]()

      // seed: bare aggregates → their direct aliases (or outright flags)
      for (m <- aggRe.findAllMatchIn(sql)) {
        val encl = enclosing(sql, m.start)
        if (!encl.exists(n => n == "cast" || n == "round")) {
          // scalar subquery shape `(SELECT sum(...))`: its value is always
          // consumed downstream — the round-2 q78 bug. Flag outright.
          val inScalarSubquery = {
            val k = encl.indexOf("")
            k >= 0 && {
              // locate that bare paren and peek at its first keyword
              var depth = 0; var i = m.start - 1; var bareSeen = -1; var found = -1
              while (i >= 0 && found < 0) {
                sql.charAt(i) match {
                  case ')'              => depth += 1
                  case '(' if depth > 0 => depth -= 1
                  case '(' =>
                    bareSeen += 1
                    var j = i - 1
                    while (j >= 0 && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j -= 1
                    if (sql.substring(j + 1, i).isEmpty) {
                      var p = i + 1
                      while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
                      if (sql.regionMatches(true, p, "SELECT", 0, 6)) {
                        // `(SELECT ...)` in TABLE position (CTE body, derived
                        // table, set-op branch, IN-list) is not a scalar
                        // subquery — classify by the token before the paren.
                        var q = i - 1
                        while (q >= 0 && sql.charAt(q).isWhitespace) q -= 1
                        var w = q
                        while (w >= 0 && (sql.charAt(w).isLetterOrDigit || sql.charAt(w) == '_')) w -= 1
                        val prevWord = sql.substring(w + 1, q + 1).toLowerCase
                        val tablePos = Set("as", "from", "join", "in", "exists",
                          "union", "intersect", "except", "all").contains(prevWord)
                        if (!tablePos) found = i
                      }
                    }
                  case _ =>
                }
                i -= 1
              }
              found >= 0
            }
          }
          if (inScalarSubquery)
            violations += s"$name: bare ${m.group(1)}() inside a scalar subquery — CAST the subquery result"
          else {
            val close = closeParen(sql, sql.indexOf('(', m.start))
            if (close > 0) aliasAfterExpr(sql, close + 1).foreach(tainted += _)
          }
        }
      }

      // propagate: tainted alias used in arithmetic / re-aliased → new alias
      var changed = true
      var rounds = 0
      while (changed && rounds < 6) {
        changed = false; rounds += 1
        for (t <- tainted.toSeq) {
          val idRe = s"(?i)(?<![a-z0-9_])${java.util.regex.Pattern.quote(t)}(?![a-z0-9_])".r
          for (m <- idRe.findAllMatchIn(sql)) {
            if (!enclosing(sql, m.start).exists(n => n == "cast" || n == "round")) {
              aliasAfterExpr(sql, m.end).foreach { a =>
                if (!tainted.contains(a)) { tainted += a; changed = true }
              }
            }
          }
        }
      }

      for (t <- tainted if outCols.contains(t))
        violations += s"$name: output column '$t' carries an uncast integer aggregate (DuckDB HUGEINT/DOUBLE vs Spark int64 — driver hash MISS)"

      // Positional pass: UNION ALL branches bind select items to output
      // columns BY POSITION, with no alias for taint to latch onto. Walk
      // every depth-0 SELECT, split its items at depth-0 commas, and flag
      // any item whose tainted identifier / bare aggregate isn't CAST.
      val fieldOrder = schemaFields
      var depth = 0
      var i = 0
      while (i < sql.length) {
        sql.charAt(i) match {
          case '(' => depth += 1; i += 1
          case ')' => depth -= 1; i += 1
          case c if depth == 0 && (c == 's' || c == 'S') &&
              sql.regionMatches(true, i, "SELECT", 0, 6) &&
              (i == 0 || (!sql.charAt(i - 1).isLetterOrDigit && sql.charAt(i - 1) != '_')) &&
              (i + 6 >= sql.length || (!sql.charAt(i + 6).isLetterOrDigit && sql.charAt(i + 6) != '_')) =>
            // collect items up to the depth-0 FROM (or end)
            var j = i + 6
            var d = 0
            var itemStart = j
            var idx = 0
            var done = false
            def checkItem(item: String, colIdx: Int): Unit = {
              if (colIdx < fieldOrder.length) {
                val hazards =
                  aggRe.findAllMatchIn(item).map(_.start) ++
                  tainted.iterator.flatMap { t =>
                    val re = s"(?i)(?<![a-z0-9_])${java.util.regex.Pattern.quote(t)}(?![a-z0-9_])".r
                    re.findAllMatchIn(item).filter { mm =>
                      // comparisons don't propagate a dtype to the item value
                      var p = mm.end
                      while (p < item.length && item.charAt(p).isWhitespace) p += 1
                      !(p < item.length && "<>=!".contains(item.charAt(p)) &&
                        !item.startsWith(">>", p) && !item.startsWith("<<", p))
                    }.map(_.start)
                  }
                if (hazards.exists(h => !enclosing(item, h).exists(n => n == "cast" || n == "round")))
                  violations += s"$name: positional select item ${colIdx + 1} ('${fieldOrder(colIdx)}') carries an uncast integer aggregate"
              }
            }
            while (j < sql.length && !done) {
              sql.charAt(j) match {
                case '(' => d += 1
                case ')' if d > 0 => d -= 1
                case ')' => done = true // exiting an enclosing paren
                case ',' if d == 0 =>
                  checkItem(sql.substring(itemStart, j), idx); idx += 1; itemStart = j + 1
                case ch if d == 0 && (ch == 'f' || ch == 'F') &&
                    sql.regionMatches(true, j, "FROM", 0, 4) &&
                    !sql.charAt(j - 1).isLetterOrDigit && sql.charAt(j - 1) != '_' &&
                    (j + 4 >= sql.length || (!sql.charAt(j + 4).isLetterOrDigit && sql.charAt(j + 4) != '_')) =>
                  done = true
                case _ =>
              }
              if (!done) j += 1
            }
            checkItem(sql.substring(itemStart, j), idx)
            i = j
          case _ => i += 1
        }
      }
    }

    assert(violations.isEmpty, "\noracle dtype lint violations:\n" + violations.mkString("\n"))
  }
}
