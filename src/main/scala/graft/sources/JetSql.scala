package graft.sources

/** Jet-SQL (Access saved-query) → Spark/ANSI SQL translation — the
  * porting layer for the queries a reference user has SAVED inside
  * their `.mdb` (Access stores them as Jet-SQL text; `mdb-schema`-era
  * workflows re-type them by hand). Covers the dialect gaps every
  * Access query hits, by token-stream rewriting (a tokenizer that
  * honors Jet's string/identifier quoting, then local rewrites — no
  * regex over quoted content, so a `*` inside a string literal is
  * never touched):
  *
  *   - `[Bracketed Identifiers]` → sanitized names (the same
  *     [[JetTypes.sanitizeName]] the migration applies to columns, so
  *     translated queries run against migrated tables verbatim);
  *   - `"double-quoted strings"` → 'single-quoted' (inner `'` doubled,
  *     Jet's own `""` escape folded);
  *   - `#1/31/2024#` / `#2024-01-31#` date literals → `DATE '…'`;
  *     with a time part → `TIMESTAMP '…'` (Jet's US m/d/y order);
  *   - `IIF(c, a, b)` → `CASE WHEN c THEN a ELSE b END` (nested IIFs
  *     recurse; argument commas found at depth 0 only);
  *   - `NZ(x, y)` → `COALESCE(x, y)`; the 1-arg form is REJECTED (its
  *     Access result is context-typed — "" in string context, 0
  *     numeric — and silently guessing corrupts data);
  *   - `&` (Jet concat, null-propagating differences documented) →
  *     `||`;
  *   - `SELECT TOP n …` → trailing `LIMIT n` (requires an ORDER BY,
  *     like Access's own deterministic reading; `TOP n PERCENT` is
  *     REJECTED with a pointer to the q_jet_top_percent tie-aware
  *     operator — LIMIT is not equivalent);
  *   - LIKE patterns: Jet wildcards `*`/`?` → `%`/`_` (only inside
  *     the string literal FOLLOWING a LIKE, never elsewhere);
  *   - function renames: UCASE→upper, LCASE→lower, LEN→length,
  *     MID→substr, INSTR→instr, CHR→char, NOW→current_timestamp,
  *     DATE()→current_date, CDBL→`CAST(x AS DOUBLE)`; CLNG/CINT →
  *     `CAST(BROUND(x) AS BIGINT/INT)` — Access rounds HALF TO EVEN
  *     (banker's), a plain integer cast would truncate;
  *   - anything it cannot translate faithfully (FORMAT, DLOOKUP,
  *     crosstab TRANSFORM, PARAMETERS) is REJECTED with the construct
  *     named — a saved query ports correctly or loudly, never subtly
  *     wrong.
  */
object JetSql {

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(
      s"jetsql: $what has no faithful ANSI translation here — " +
        "port this saved query by hand (the engine-side operators " +
        "cover TRANSFORM via q_pivot/q_crosstab_totals and TOP n " +
        "PERCENT via q_jet_top_percent)")

  /** Token: (kind, text). Kinds: word, string ('…' already ANSI),
    * number, punct, ws. Identifiers from […] arrive pre-sanitized as
    * words; date literals arrive as finished DATE/TIMESTAMP strings
    * (kind punct carries them whole). */
  private final case class Tok(kind: String, text: String)

  private def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) {
        var j = i
        while (j < n && sql.charAt(j).isWhitespace) j += 1
        out += Tok("ws", " ")
        i = j
      } else if (c == '[') {
        val j = sql.indexOf(']', i + 1)
        require(j > 0, s"jetsql: unterminated [identifier at $i")
        out += Tok("word", JetTypes.sanitizeName(sql.substring(i + 1, j)))
        i = j + 1
      } else if (c == '"') {
        // Jet string: "" escapes a quote
        val sb = new StringBuilder
        var j = i + 1
        var done = false
        while (!done) {
          require(j < n, s"jetsql: unterminated string at $i")
          val ch = sql.charAt(j)
          if (ch == '"') {
            if (j + 1 < n && sql.charAt(j + 1) == '"') {
              sb.append('"'); j += 2
            } else { done = true; j += 1 }
          } else { sb.append(ch); j += 1 }
        }
        out += Tok("string", sb.toString)
        i = j
      } else if (c == '\'') {
        // already-ANSI string: '' escape
        val sb = new StringBuilder
        var j = i + 1
        var done = false
        while (!done) {
          require(j < n, s"jetsql: unterminated string at $i")
          val ch = sql.charAt(j)
          if (ch == '\'') {
            if (j + 1 < n && sql.charAt(j + 1) == '\'') {
              sb.append('\''); j += 2
            } else { done = true; j += 1 }
          } else { sb.append(ch); j += 1 }
        }
        out += Tok("string", sb.toString)
        i = j
      } else if (c == '#') {
        val j = sql.indexOf('#', i + 1)
        require(j > 0, s"jetsql: unterminated #date# literal at $i")
        out += Tok("date", sql.substring(i + 1, j))
        i = j + 1
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (sql.charAt(j).isLetterOrDigit ||
          sql.charAt(j) == '_')) j += 1
        out += Tok("word", sql.substring(i, j))
        i = j
      } else if (c.isDigit) {
        var j = i
        while (j < n && (sql.charAt(j).isDigit || sql.charAt(j) == '.'))
          j += 1
        out += Tok("number", sql.substring(i, j))
        i = j
      } else {
        out += Tok("punct", c.toString)
        i += 1
      }
    }
    out.result()
  }

  /** Jet #date# text → ANSI literal. Accepts m/d/yyyy (Jet's US
    * order) and ISO y-m-d, each with an optional HH:MM[:SS] part. */
  private def dateLiteral(body: String): String = {
    val parts = body.trim.split("\\s+", 2)
    val d = parts(0)
    val iso =
      if (d.contains("/")) {
        val f = d.split("/")
        require(f.length == 3, s"jetsql: bad date '$body'")
        f"${f(2).toInt}%04d-${f(0).toInt}%02d-${f(1).toInt}%02d"
      } else {
        val f = d.split("-")
        require(f.length == 3, s"jetsql: bad date '$body'")
        f"${f(0).toInt}%04d-${f(1).toInt}%02d-${f(2).toInt}%02d"
      }
    if (parts.length == 1) s"DATE '$iso'"
    else {
      val t = parts(1).split(":")
      val hms = f"${t(0).toInt}%02d:${t(1).toInt}%02d:" +
        f"${(if (t.length > 2) t(2).toInt else 0)}%02d"
      s"TIMESTAMP '$iso $hms'"
    }
  }

  private val renames = Map(
    "ucase" -> "upper", "lcase" -> "lower", "len" -> "length",
    "mid" -> "substr", "instr" -> "instr", "chr" -> "char")
  // CDbl is a pure widening cast; CLng/CInt are NOT plain casts —
  // Access rounds HALF TO EVEN (banker's) where CAST(double AS
  // BIGINT) truncates in Spark, so they translate through BROUND
  // (Spark's banker's rounding). CLng(2.5) = 2 in Access AND here.
  private val castFns = Map("cdbl" -> "DOUBLE")
  private val broundFns = Map("clng" -> "BIGINT", "cint" -> "INT")
  private val rejected = Set(
    "format", "dlookup", "dsum", "dcount", "transform", "parameters")

  private def isWord(t: Tok, w: String): Boolean =
    t.kind == "word" && t.text.equalsIgnoreCase(w)

  /** Render one token back to SQL text. */
  private def render(t: Tok): String = t.kind match {
    case "string" => "'" + t.text.replace("'", "''") + "'"
    case "date" => dateLiteral(t.text)
    case other => t.text
  }

  /** Split `toks` (the inside of a call) at depth-0 commas. */
  private def splitArgs(toks: Vector[Tok]): Vector[Vector[Tok]] = {
    val out = Vector.newBuilder[Vector[Tok]]
    var depth = 0
    var cur = Vector.newBuilder[Tok]
    toks.foreach { t =>
      if (t.kind == "punct" && t.text == "(") { depth += 1; cur += t }
      else if (t.kind == "punct" && t.text == ")") { depth -= 1; cur += t }
      else if (t.kind == "punct" && t.text == "," && depth == 0) {
        out += cur.result(); cur = Vector.newBuilder[Tok]
      } else cur += t
    }
    out += cur.result()
    out.result()
  }

  /** Find the matching ')' for the '(' at `open` (index into toks). */
  private def closeOf(toks: Vector[Tok], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == "punct" && t.text == "(") depth += 1
      else if (t.kind == "punct" && t.text == ")") {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    throw new IllegalArgumentException("jetsql: unbalanced parentheses")
  }

  /** Rewrite a token stream to ANSI text (recursive for IIF/NZ).
    * Spacing is handled at TOKEN level (a pending-separator flag), so
    * a multi-space run inside a translated STRING LITERAL survives —
    * a string-level whitespace collapse would corrupt literal
    * content. */
  private def emit(toks: Vector[Tok]): String = {
    val sb = new StringBuilder
    var pendingSpace = false
    def put(text: String): Unit = {
      if (pendingSpace && sb.nonEmpty) sb.append(' ')
      pendingSpace = false
      sb.append(text)
    }
    var i = 0
    var limit: Option[String] = None
    var lastWord: String = ""
    def nextNonWs(from: Int): Int = {
      var j = from
      while (j < toks.length && toks(j).kind == "ws") j += 1
      j
    }
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == "ws") { pendingSpace = true; i += 1 }
      else if (t.kind == "word" && rejected.contains(t.text.toLowerCase)) {
        fail(s"the ${t.text.toUpperCase} construct")
      } else if (isWord(t, "top") &&
        lastWord.equalsIgnoreCase("select") && {
          val nn = nextNonWs(i + 1)
          nn < toks.length && toks(nn).kind == "number"
        }) {
        // SELECT TOP n ... -> ... LIMIT n (PERCENT rejected); a
        // column merely NAMED [Top] is either not in SELECT's keyword
        // position or not followed by a count, and passes through
        val nIdx = nextNonWs(i + 1)
        val pIdx = nextNonWs(nIdx + 1)
        if (pIdx < toks.length && isWord(toks(pIdx), "percent"))
          fail("TOP n PERCENT (tie semantics)")
        limit = Some(toks(nIdx).text)
        lastWord = "top"
        i = nIdx + 1
      } else if (isWord(t, "iif") &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text == "(") {
        val open = nextNonWs(i + 1)
        val close = closeOf(toks, open)
        val args = splitArgs(toks.slice(open + 1, close))
        require(args.length == 3,
          s"jetsql: IIF takes 3 arguments, got ${args.length}")
        put("CASE WHEN " + emit(args(0)) + " THEN " + emit(args(1)) +
          " ELSE " + emit(args(2)) + " END")
        lastWord = "end"
        i = close + 1
      } else if (isWord(t, "nz") &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text == "(") {
        val open = nextNonWs(i + 1)
        val close = closeOf(toks, open)
        val args = splitArgs(toks.slice(open + 1, close))
        if (args.length != 2)
          fail("1-argument NZ (its result type is context-dependent)")
        put("COALESCE(" + emit(args(0)) + ", " + emit(args(1)) + ")")
        lastWord = "coalesce"
        i = close + 1
      } else if (t.kind == "word" &&
        castFns.contains(t.text.toLowerCase) &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text == "(") {
        val open = nextNonWs(i + 1)
        val close = closeOf(toks, open)
        put("CAST(" + emit(toks.slice(open + 1, close)) + " AS " +
          castFns(t.text.toLowerCase) + ")")
        lastWord = "cast"
        i = close + 1
      } else if (t.kind == "word" &&
        broundFns.contains(t.text.toLowerCase) &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text == "(") {
        val open = nextNonWs(i + 1)
        val close = closeOf(toks, open)
        put("CAST(BROUND(" + emit(toks.slice(open + 1, close)) +
          ") AS " + broundFns(t.text.toLowerCase) + ")")
        lastWord = "cast"
        i = close + 1
      } else if (t.kind == "word" &&
        renames.contains(t.text.toLowerCase)) {
        put(renames(t.text.toLowerCase))
        lastWord = t.text
        i += 1
      } else if (isWord(t, "now") &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text == "(" &&
        toks.slice(nextNonWs(i + 1) + 1,
          closeOf(toks, nextNonWs(i + 1))).forall(_.kind == "ws")) {
        put("current_timestamp")
        lastWord = "now"
        i = closeOf(toks, nextNonWs(i + 1)) + 1
      } else if (isWord(t, "date") &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text == "(" &&
        toks.slice(nextNonWs(i + 1) + 1,
          closeOf(toks, nextNonWs(i + 1))).forall(_.kind == "ws")) {
        put("current_date")
        lastWord = "date"
        i = closeOf(toks, nextNonWs(i + 1)) + 1
      } else if (t.kind == "punct" && t.text == "&") {
        put("||")
        i += 1
      } else if (isWord(t, "mod") && !lastWord.isEmpty &&
        nextNonWs(i + 1) < toks.length &&
        toks(nextNonWs(i + 1)).text != "(") {
        // Jet's infix Mod operator → % (a leading or call-form `mod`
        // is left alone — e.g. a function or a column named mod)
        put("%")
        i += 1
      } else if (isWord(t, "like")) {
        // translate the wildcards of the literal that follows
        put("LIKE")
        lastWord = "like"
        val litIdx = nextNonWs(i + 1)
        if (litIdx < toks.length && toks(litIdx).kind == "string") {
          pendingSpace = true
          put(render(Tok("string",
            toks(litIdx).text.replace('*', '%').replace('?', '_'))))
          i = litIdx + 1
        } else i += 1
      } else {
        put(render(t))
        if (t.kind == "word") lastWord = t.text
        i += 1
      }
    }
    limit.foreach(n => sb.append(" LIMIT ").append(n))
    sb.toString.trim
  }

  /** Translate one Jet-SQL statement to Spark-runnable ANSI SQL. */
  def translate(jetSql: String): String = emit(tokenize(jetSql))
}
