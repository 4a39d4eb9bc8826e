package graft

import graft.pipeline.AccessSql.translate

/** MS-Access SQL → Spark SQL translator (reference:
  * sql-converter/ms_access_to_databricks_sql.py). String-level
  * rewrites pinned case by case, then an end-to-end execution check
  * against a directly-written ANSI query on the same data.
  */
class AccessSqlSpec extends SparkSpec {

  test("IIf translates nesting- and comma-aware") {
    // the reference's regex form cannot see the comma inside the
    // string literal or the nested Nz — the tokenizer can
    assert(translate("""SELECT IIf([Total Price]>100, "big,one", Nz([note], "none")) FROM t""")
      == "SELECT CASE WHEN `Total Price`>100 THEN 'big,one' ELSE COALESCE(note, 'none') END FROM t")
    // nested IIf
    assert(translate("""IIf(a>1, IIf(b>2, "x", "y"), "z")""")
      == "CASE WHEN a>1 THEN CASE WHEN b>2 THEN 'x' ELSE 'y' END ELSE 'z' END")
  }

  test("bracket identifiers: bare when clean, backticks when spacey") {
    assert(translate("SELECT [o_orderkey], [Unit Price], [some-col] FROM [Order Details]")
      == "SELECT o_orderkey, `Unit Price`, `some-col` FROM `Order Details`")
  }

  test("LIKE wildcards translate inside the pattern only; SELECT * survives") {
    // the reference rewrote EVERY '*' to '%', destroying SELECT *
    assert(translate("""SELECT * FROM t WHERE name LIKE "Sm?th*" AND note LIKE 'a*b'""")
      == "SELECT * FROM t WHERE name LIKE 'Sm_th%' AND note LIKE 'a%b'")
    // '*' in arithmetic untouched
    assert(translate("SELECT a * b FROM t") == "SELECT a * b FROM t")
  }

  test("dates, Date()/Now(), concatenation, function renames") {
    assert(translate("SELECT Date(), Now() FROM t WHERE d >= #3/14/2024#")
      == "SELECT current_date, current_timestamp FROM t WHERE d >= DATE'2024-03-14'")
    assert(translate("#1/2/1995 10:30:00#") == "TIMESTAMP'1995-01-02 10:30:00'")
    assert(translate("""SELECT UCase(a) & "-" & LCase(b), Len(c), Mid(d, 2, 3) FROM t""")
      == "SELECT upper(a) || '-' || lower(b), length(c), substr(d, 2, 3) FROM t")
    assert(translate("""Format(d, "yyyy-MM")""") == "date_format(d, 'yyyy-MM')")
    assert(translate("Nz(x)") == "COALESCE(x, '')")
  }

  test("TOP and INTO restructure the statement") {
    assert(translate("SELECT TOP 10 a FROM t ORDER BY a")
      == "SELECT a FROM t ORDER BY a LIMIT 10")
    assert(translate("SELECT a, b INTO [staging out] FROM t WHERE a > 1")
      == "CREATE OR REPLACE TEMPORARY VIEW `staging out` AS\nSELECT a, b FROM t WHERE a > 1")
  }

  test("INTO strips only in the SELECT make-table form; INSERT INTO passes through") {
    // the INTO pass used to be statement-agnostic, mangling INSERT
    // INTO into an invalid CREATE VIEW ... INSERT — only Access's
    // make-table (SELECT ... INTO t FROM ...) may restructure
    val ins = "INSERT INTO t VALUES (1, 'x')"
    assert(translate(ins) == ins)
    val insSel = "INSERT INTO t SELECT a FROM s WHERE a > 1"
    assert(translate(insSel) == insSel)
    // the make-table form still restructures
    assert(translate("SELECT a INTO t2 FROM t")
      == "CREATE OR REPLACE TEMPORARY VIEW t2 AS\nSELECT a FROM t")
  }

  test("Access-only LIKE wildcards (# digit, charlists) compile to anchored RLIKE") {
    // '#' (one digit) and [charlist]/[!charlist] have no LIKE
    // equivalent — those patterns become anchored regexes; plain
    // patterns keep using LIKE (previous test)
    assert(translate("""SELECT a FROM t WHERE a LIKE "A#"""")
      == "SELECT a FROM t WHERE a RLIKE '^A[0-9]$'")
    assert(translate("""x LIKE "m[ae]n"""") == "x RLIKE '^m[ae]n$'")
    assert(translate("""x LIKE "b[!ae]ll*"""") == "x RLIKE '^b[^ae]ll.*$'")
    // literal regex metacharacters are escaped; the backslash is
    // doubled because Spark's string-literal layer consumes one
    assert(translate("""x LIKE "1.5#"""") == "x RLIKE '^1\\\\.5[0-9]$'")
    // execution agrees with Access semantics, including NOT LIKE
    def matching(pattern: String, not: Boolean = false): Seq[String] =
      spark.sql("SELECT v FROM VALUES ('man'),('men'),('mun'),('A7'),"
          + "('Ax'),('1.5'),('1x5') AS t(v) WHERE "
          + translate(s"""v ${if (not) "NOT " else ""}LIKE "$pattern""""))
        .collect().map(_.getString(0)).toSeq.sorted
    assert(matching("m[ae]n") == Seq("man", "men"))
    assert(matching("m[!ae]n") == Seq("mun"))
    assert(matching("A#") == Seq("A7"))
    assert(matching("1.#") == Seq("1.5"),
      "dot matches literally ('1x5' excluded), not as regex any-char")
    assert(matching("m[ae]n", not = true) ==
      Seq("1.5", "1x5", "A7", "Ax", "mun"))
  }

  test("backslash-bearing patterns route to RLIKE so the wildcard survives") {
    // in the LIKE fast path the emitter's backslash doubling would
    // reach the engine as \% — LIKE's escape for a literal percent —
    // silently disabling the wildcard; such patterns compile through
    // the regex path instead
    assert(translate("""x LIKE "C:\*"""") == """x RLIKE '^C:\\\\.*$'""")
    // NB doubled backslashes inside the SQL literals: Spark's string
    // parser consumes one layer, so '\\' yields a single backslash in
    // the value (and '\t' would otherwise become a tab)
    val got = spark.sql("""SELECT v FROM VALUES ('C:\\temp\\f.txt'),"""
        + """('C:'),('D:\\x') AS t(v) WHERE """
        + translate("""v LIKE "C:\*""""))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(got == Seq("C:\\temp\\f.txt"),
      s"'C:\\*' must match files under C:\\ only, got $got")
  }

  test("table renames hit identifiers only, never string literals") {
    val out = translate("""SELECT 'orders' AS lit FROM orders JOIN [orders] o2 ON 1=1""",
      Map("orders" -> "lake.orders_v"))
    assert(out == "SELECT 'orders' AS lit FROM lake.orders_v JOIN `lake.orders_v` o2 ON 1=1"
      || out == "SELECT 'orders' AS lit FROM lake.orders_v JOIN lake.orders_v o2 ON 1=1",
      out)
  }

  test("unknown constructs pass through verbatim") {
    val sql = "SELECT weird_fn(a, b) <> 3, x FROM t GROUP BY x HAVING count(1) >= 2"
    assert(translate(sql) == sql)
  }

  test("end-to-end: translated Access query equals hand-written ANSI on orders") {
    val orders = Tables.load(spark, sf, "orders")
    orders.createOrReplaceTempView("graft_access_e2e")
    val access =
      """SELECT TOP 20 [o_orderkey],
        |  IIf([o_totalprice] > 150000, "big", "small") AS bucket,
        |  UCase([o_orderstatus]) & "-" & [o_orderpriority] AS tag
        |FROM legacy_orders
        |WHERE [o_orderpriority] LIKE "1*" AND [o_orderdate] >= #1/1/1995#
        |ORDER BY [o_orderkey]""".stripMargin
    val got = spark.sql(translate(access,
        Map("legacy_orders" -> "graft_access_e2e")))
      .collect().map(_.toString).toSeq
    val want = spark.sql(
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS bucket,
        |  upper(o_orderstatus) || '-' || o_orderpriority AS tag
        |FROM graft_access_e2e
        |WHERE o_orderpriority LIKE '1%' AND o_orderdate >= DATE'1995-01-01'
        |ORDER BY o_orderkey LIMIT 20""".stripMargin)
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want,
      s"translated execution diverges: ${got.take(2)} vs ${want.take(2)}")
  }
}
