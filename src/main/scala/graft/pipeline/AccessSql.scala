package graft.pipeline

/** MS-Access SQL → Spark SQL translation — the graft counterpart of
  * the reference's sql-converter
  * (ingest-framework/sql-converter/ms_access_to_databricks_sql.py:7
  * `to_databricks_sql(sql, replace_dict)`), the one reference
  * directory that had no graft equivalent through r14. A migration
  * user points legacy Access queries at the lake; the translated
  * text runs through `spark.sql` / [[Transforms]]' sql step.
  *
  * Same surface as the reference, re-expressed over a real tokenizer
  * instead of regexes (the reference's `IIf` regex cannot see nested
  * commas and its `* → %` rewrite fires on `SELECT *`; tokenizing
  * first makes every rewrite context-aware — divergences from the
  * reference are all of this strictly-more-correct kind and are
  * documented per rule):
  *
  *  - table renames from a source→replace map, applied to IDENTIFIER
  *    tokens only (`replace_tables`: the reference regexes the whole
  *    text, which also hits string literals);
  *  - `"double quoted"` Access string literals → `'single quoted'`;
  *  - `[bracketed identifiers]` → bare, or backtick-quoted when they
  *    carry spaces/hyphens (`escape_identifiers`);
  *  - `IIf(c, t, f)` → `CASE WHEN c THEN t ELSE f END`, nesting- and
  *    comma-aware, arguments translated recursively;
  *  - `Nz(x, v)` → `COALESCE(x, v)`; 1-arg `Nz(x)` → `COALESCE(x, '')`;
  *  - `Date()` → `current_date`, `Now()` → `current_timestamp`,
  *    `Format(x, "f")` → `date_format(x, 'f')`;
  *  - Access LIKE wildcards, ONLY inside the pattern literal of a
  *    LIKE: `*` → `%`, `?` → `_` (the reference rewrites every `*`
  *    in the statement); patterns using Access's `#` (one digit) or
  *    `[charlist]`/`[!charlist]` classes — which LIKE cannot express
  *    — compile to an anchored RLIKE regex instead;
  *  - `#3/14/2024#` date literals → `DATE'2024-03-14'` (US m/d/y,
  *    Access's literal order; with a time part → `TIMESTAMP'…'`);
  *  - `&` string concatenation → `||`;
  *  - `SELECT TOP n …` → trailing `LIMIT n`;
  *  - `SELECT … INTO t FROM …` →
  *    `CREATE OR REPLACE TEMPORARY VIEW t AS SELECT … FROM …`
  *    (the reference's make-table handling — a temp view, not a
  *    write, exactly as the reference emits);
  *  - casing/no-op normalizations: `UCase/LCase/Len/InStr/Mid` →
  *    `upper/lower/length/instr/substr` (public Access↔ANSI names).
  *
  * Everything else passes through untouched — the translator never
  * guesses: unknown functions and identifiers survive verbatim so
  * Spark's analyzer produces the real error.
  */
object AccessSql {

  private sealed trait Tok { def text: String }
  private final case class Word(text: String) extends Tok
  private final case class Str(text: String) extends Tok // raw incl quotes
  private final case class BracketId(inner: String) extends Tok {
    def text: String = s"[$inner]"
  }
  private final case class HashLit(inner: String) extends Tok {
    def text: String = s"#$inner#"
  }
  private final case class Sym(text: String) extends Tok
  private final case class Ws(text: String) extends Tok

  private def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) {
        val j = (i until n).find(k => !sql.charAt(k).isWhitespace).getOrElse(n)
        out += Ws(sql.substring(i, j)); i = j
      } else if (c == '\'' || c == '"') {
        // quote-doubling escapes ('' / "") stay inside one literal
        val q = c
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == q) {
            if (j + 1 < n && sql.charAt(j + 1) == q) j += 2
            else { done = true; j += 1 }
          } else j += 1
        }
        out += Str(sql.substring(i, j)); i = j
      } else if (c == '[') {
        val j = sql.indexOf(']', i + 1)
        val end = if (j < 0) n else j
        out += BracketId(sql.substring(i + 1, end)); i = end + 1
      } else if (c == '#') {
        val j = sql.indexOf('#', i + 1)
        if (j < 0) { out += Sym("#"); i += 1 }
        else { out += HashLit(sql.substring(i + 1, j)); i = j + 1 }
      } else if (c == '`') {
        val j = sql.indexOf('`', i + 1)
        val end = if (j < 0) n else j
        out += Word(sql.substring(i, end + 1)); i = end + 1
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < n && (sql.charAt(j).isLetterOrDigit ||
          sql.charAt(j) == '_')) j += 1
        out += Word(sql.substring(i, j)); i = j
      } else if (c.isDigit) {
        var j = i + 1
        while (j < n && (sql.charAt(j).isLetterOrDigit ||
          sql.charAt(j) == '.')) j += 1
        out += Word(sql.substring(i, j)); i = j
      } else {
        // multi-char operators kept whole so `<>`/`>=` survive
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<>", "<=", ">=", "!=", "||").contains(two)) {
          out += Sym(two); i += 2
        } else { out += Sym(c.toString); i += 1 }
      }
    }
    out.result()
  }

  private def needsQuote(ident: String): Boolean =
    ident.isEmpty || !ident.forall(ch => ch.isLetterOrDigit || ch == '_') ||
      ident.head.isDigit

  private def renderIdent(ident: String): String =
    if (needsQuote(ident)) "`" + ident.replace("`", "``") + "`" else ident

  /** Access double-quoted literal → single-quoted Spark literal. */
  private def toSingleQuoted(raw: String): String =
    if (raw.length >= 2 && raw.head == '"') {
      val inner = raw.substring(1, raw.length - 1).replace("\"\"", "\"")
      "'" + inner.replace("'", "''") + "'"
    } else raw

  /** `#3/14/2024#` / `#3/14/2024 10:30:00#` → DATE / TIMESTAMP
    * literal. Access writes m/d/y; an already-ISO `#2024-03-14#`
    * passes through as the same date.
    */
  private def hashToLiteral(inner: String): String = {
    val parts = inner.trim.split("\\s+", 2)
    val datePart = parts(0)
    val iso = datePart.split("[/-]") match {
      case Array(m, d, y) if y.length == 4 => f"$y-${m.toInt}%02d-${d.toInt}%02d"
      case Array(y, m, d) if y.length == 4 => f"$y-${m.toInt}%02d-${d.toInt}%02d"
      case _ => datePart
    }
    if (parts.length == 2) s"TIMESTAMP'$iso ${parts(1)}'" else s"DATE'$iso'"
  }

  /** Access LIKE pattern → (operator, Spark pattern). Plain `*`/`?`
    * wildcards map onto LIKE's `%`/`_`. Access additionally supports
    * `#` (exactly one digit) and `[charlist]`/`[!charlist]` classes,
    * which have NO LIKE equivalent — those patterns compile to an
    * anchored RLIKE regex instead (LIKE and RLIKE share Spark's
    * three-valued NULL semantics, and `NOT RLIKE` parses, so the
    * surrounding predicate is unchanged). Every literal character is
    * regex-escaped; an unterminated `[` falls back to a literal
    * bracket rather than a broken class. Backslash-bearing patterns
    * (e.g. `C:\*`) also route to RLIKE: the emitter doubles
    * backslashes for Spark's string-literal layer, which in the LIKE
    * fast path would leave the engine seeing `\%` — LIKE's escape for
    * a literal percent — silently disabling the wildcard, whereas the
    * regex compiler escapes the backslash as a literal correctly.
    */
  private def likeToSpark(pattern: String): (String, String) =
    if (!pattern.exists(c => c == '#' || c == '[' || c == '\\'))
      ("LIKE", pattern.replace('*', '%').replace('?', '_'))
    else {
      val sb = new StringBuilder("^")
      def esc(c: Char): String =
        if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) "\\" + c else c.toString
      var i = 0
      while (i < pattern.length) {
        pattern.charAt(i) match {
          case '*' => sb.append(".*"); i += 1
          case '?' => sb.append('.'); i += 1
          case '#' => sb.append("[0-9]"); i += 1
          case '[' =>
            val close = pattern.indexOf(']', i + 1)
            if (close < 0) { sb.append("\\["); i += 1 }
            else {
              var body = pattern.substring(i + 1, close)
              val neg = body.startsWith("!")
              if (neg) body = body.substring(1)
              // '-' keeps its range meaning (shared by Access and
              // regex classes); class-meta chars are escaped
              val escd = body.flatMap(ch =>
                if (ch == '\\' || ch == '^' || ch == ']') "\\" + ch
                else ch.toString)
              sb.append(if (neg) s"[^$escd]" else s"[$escd]")
              i = close + 1
            }
          case other => sb.append(esc(other)); i += 1
        }
      }
      sb.append('$')
      ("RLIKE", sb.toString)
    }

  private val fnRename = Map(
    "nz" -> "coalesce", "ucase" -> "upper", "lcase" -> "lower",
    "len" -> "length", "instr" -> "instr", "mid" -> "substr",
    "format" -> "date_format")

  /** Translate one Access SQL statement. `tableMap` renames tables
    * (source → replacement, case-insensitive on the source), the
    * reference's `replace_dict`.
    */
  def translate(sql: String, tableMap: Map[String, String] = Map.empty): String = {
    val lowerMap = tableMap.map { case (k, v) => k.toLowerCase -> v }
    val toks = tokenize(sql)

    // ---- statement-level passes over the raw token stream ----
    // SELECT [DISTINCT] TOP n  →  drop, remember n for a LIMIT tail
    // SELECT … INTO t FROM …   →  drop INTO t, remember t for a view
    var limit: Option[String] = None
    var intoTable: Option[String] = None
    val firstKeyword: Option[String] = toks.collectFirst {
      case w: Word => w.text.toLowerCase
    }
    val core = Vector.newBuilder[Tok]
    var i = 0
    def isW(t: Tok, w: String): Boolean =
      t.isInstanceOf[Word] && t.text.equalsIgnoreCase(w)
    def nextNonWs(from: Int): Int = {
      var j = from
      while (j < toks.length && toks(j).isInstanceOf[Ws]) j += 1
      j
    }
    var depth = 0
    while (i < toks.length) {
      val t = toks(i)
      t match {
        case Sym("(") => depth += 1
        case Sym(")") => depth -= 1
        case _ =>
      }
      if (depth == 0 && isW(t, "top") && limit.isEmpty) {
        val j = nextNonWs(i + 1)
        // only SELECT-clause TOP with a numeric count is the Access form
        if (j < toks.length && toks(j).isInstanceOf[Word] &&
            toks(j).text.forall(_.isDigit)) {
          limit = Some(toks(j).text)
          i = nextNonWs(j + 1) // skip TOP, n, and the following gap
        } else { core += t; i += 1 }
      } else if (depth == 0 && isW(t, "into") && intoTable.isEmpty &&
          firstKeyword.contains("select")) {
        // only the Access make-table form (SELECT … INTO t FROM …)
        // strips INTO; INSERT INTO / anything non-SELECT passes
        // through untouched (rewriting those produced invalid SQL)
        val j = nextNonWs(i + 1)
        val name = toks.lift(j) match {
          case Some(BracketId(x)) => Some(x)
          case Some(Word(x)) if !x.equalsIgnoreCase("from") => Some(x)
          case _ => None
        }
        name match {
          case Some(x) => intoTable = Some(x); i = nextNonWs(j + 1)
          case None => core += t; i += 1
        }
      } else { core += t; i += 1 }
    }

    // ---- recursive expression-level rewrite ----
    val ts = core.result()
    val sb = new StringBuilder
    def emit(s: String): Unit = sb.append(s)

    def matchingParen(from: Int): Int = { // from points AT '('
      var d = 0
      var j = from
      while (j < ts.length) {
        ts(j) match {
          case Sym("(") => d += 1
          case Sym(")") => d -= 1; if (d == 0) return j
          case _ =>
        }
        j += 1
      }
      ts.length - 1
    }
    def splitArgs(from: Int, to: Int): Seq[(Int, Int)] = {
      // top-level comma split of the token span (from, to) EXCLUSIVE
      var d = 0
      var start = from + 1
      val parts = Seq.newBuilder[(Int, Int)]
      var j = from + 1
      while (j < to) {
        ts(j) match {
          case Sym("(") => d += 1
          case Sym(")") => d -= 1
          case Sym(",") if d == 0 => parts += ((start, j)); start = j + 1
          case _ =>
        }
        j += 1
      }
      if (to > start || parts.result().nonEmpty) parts += ((start, to))
      parts.result()
    }
    def renderSpan(from: Int, to: Int): String = {
      val saved = sb.length
      walk(from, to)
      val s = sb.substring(saved)
      sb.setLength(saved)
      s.trim
    }
    def walk(from: Int, to: Int): Unit = {
      var j = from
      while (j < to) {
        ts(j) match {
          case Word(w) if w.equalsIgnoreCase("iif") &&
              nextNonWs(j + 1) < to && isOpen(nextNonWs(j + 1)) =>
            val open = nextNonWs(j + 1)
            val close = matchingParen(open)
            val args = splitArgs(open, close)
            if (args.length == 3) {
              val Seq(c, t1, f1) = args.map { case (a, b) => renderSpan(a, b) }
              emit(s"CASE WHEN $c THEN $t1 ELSE $f1 END")
              j = close + 1
            } else { emit(w); j += 1 }
          case Word(w) if w.equalsIgnoreCase("nz") &&
              nextNonWs(j + 1) < to && isOpen(nextNonWs(j + 1)) =>
            val open = nextNonWs(j + 1)
            val close = matchingParen(open)
            val args = splitArgs(open, close).map { case (a, b) => renderSpan(a, b) }
            args match {
              case Seq(x) => emit(s"COALESCE($x, '')")
              case Seq(x, v) => emit(s"COALESCE($x, $v)")
              case _ => emit(s"COALESCE(${args.mkString(", ")})")
            }
            j = close + 1
          case Word(w) if w.equalsIgnoreCase("date") &&
              emptyCall(j, to) =>
            emit("current_date"); j = matchingParen(nextNonWs(j + 1)) + 1
          case Word(w) if w.equalsIgnoreCase("now") && emptyCall(j, to) =>
            emit("current_timestamp"); j = matchingParen(nextNonWs(j + 1)) + 1
          case Word(w) if fnRename.contains(w.toLowerCase) &&
              nextNonWs(j + 1) < to && isOpen(nextNonWs(j + 1)) =>
            emit(fnRename(w.toLowerCase)); j += 1
          case Word(w) if w.equalsIgnoreCase("like") =>
            // Access wildcards live in the pattern literal only
            val j2 = nextNonWs(j + 1)
            ts.lift(j2) match {
              case Some(Str(raw)) if j2 < to =>
                val lit = toSingleQuoted(raw)
                val (op, inner) =
                  likeToSpark(lit.substring(1, lit.length - 1))
                // backslashes doubled: Spark's SQL string literals
                // are escape-processed before the regex sees them
                emit(op + " '" + inner.replace("\\", "\\\\") + "'")
                j = j2 + 1
              case _ => emit("LIKE"); j += 1
            }
          case Word(w) =>
            lowerMap.get(w.toLowerCase) match {
              case Some(repl) => emit(repl)
              case None => emit(w)
            }
            j += 1
          case BracketId(x) =>
            emit(lowerMap.get(x.toLowerCase).map(renderIdent)
              .getOrElse(renderIdent(x)))
            j += 1
          case Str(raw) => emit(toSingleQuoted(raw)); j += 1
          case HashLit(x) => emit(hashToLiteral(x)); j += 1
          case Sym("&") => emit("||"); j += 1
          case Sym(s) => emit(s); j += 1
          case Ws(s) => emit(s); j += 1
        }
      }
    }
    def isOpen(j: Int): Boolean = ts.lift(j).contains(Sym("("))
    def emptyCall(j: Int, to: Int): Boolean = {
      val open = nextNonWs(j + 1)
      open < to && isOpen(open) && {
        val close = matchingParen(open)
        nextNonWs(open + 1) == close
      }
    }

    walk(0, ts.length)
    var outSql = sb.toString.trim
    limit.foreach(n => outSql = s"$outSql LIMIT $n")
    intoTable.foreach { t =>
      outSql = s"CREATE OR REPLACE TEMPORARY VIEW ${renderIdent(t)} AS\n" +
        outSql
    }
    outSql
  }
}
