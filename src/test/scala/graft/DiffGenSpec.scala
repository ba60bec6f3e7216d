package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.DiffGen
import graft.operators.{DiffOptions, DiffSql, TableDiff}

/** Mirrors the reference's CLI behaviors (tests/test_diffgen.py:197-249
  * plus the loader/inference units) and cross-checks the emitted SQL
  * against the native operator by executing it in Spark.
  */
class DiffGenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpCsv(name: String, content: String): Path = {
    val dir = Files.createTempDirectory("diffgen")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p
  }

  private val beforeCsv =
    """name,type,kind,null?
      |k1,INT,,
      |val,VARCHAR,,
      |""".stripMargin
  private val afterCsv =
    """name,type
      |k1,INT
      |val,VARCHAR
      |new_col,NUMBER(10,2)
      |""".stripMargin
  private val keysCsv = "name,type\nk1,INT\n"

  test("schema CSV loader reads truncated headers, upper-cases names (G1)") {
    val p = tmpCsv("example_before.csv", beforeCsv)
    assert(DiffGen.loadSchemaCsv(p.toString) == Seq("K1" -> "INT", "VAL" -> "VARCHAR"))
  }

  test("schema CSV loader handles quoted type cells with embedded commas") {
    val p = tmpCsv("t.csv",
      """name,type,kind
        |MY_COL,"NUMBER(38,0)",COLUMN
        |OTHER,"VARCHAR(50)",COLUMN
        |""".stripMargin)
    assert(DiffGen.loadSchemaCsv(p.toString) ==
      Seq("MY_COL" -> "NUMBER(38,0)", "OTHER" -> "VARCHAR(50)"))
  }

  test("flag missing its value fails with a message, not an index error") {
    val e = intercept[IllegalArgumentException] {
      DiffGen.parseArgs(Seq("b.csv", "a.csv", "--keys"))
    }
    assert(e.getMessage.contains("--keys requires a value"))
  }

  test("type classing collapses to TEXT/NUMBER with TEXT fallback (G2)") {
    assert(DiffGen.typeClass("NUMBER(15,2)") == "NUMBER")
    assert(DiffGen.typeClass("DECIMAL") == "NUMBER")
    assert(DiffGen.typeClass("VARCHAR(50)") == "TEXT")
    assert(DiffGen.typeClass("DATE") == "TEXT") // reference fallback
  }

  test("table-name inference: filename stem, underscore → dot (G4)") {
    assert(DiffGen.inferTableName("/tmp/x/example_before.csv") == "example.before")
  }

  test("CLI end-to-end: emits CTAS diff SQL; --single_line + --stack_input append") {
    val b = tmpCsv("example_before.csv", beforeCsv)
    val a = tmpCsv("example_after.csv", afterCsv)
    val k = tmpCsv("example_keys.csv", keysCsv)
    val out = Files.createTempDirectory("diffgen").resolve("diff.sql")
    val stack = Files.createTempDirectory("diffgen").resolve("stack.sql")
    Files.writeString(stack, "SELECT 1;\n") // pre-existing stack content
    DiffGen.main(Array(
      b.toString, a.toString, "--keys", k.toString,
      "--out", out.toString, "--single_line", "--stack_input", stack.toString))
    val sql = Files.readString(out)
    assert(sql.contains("CREATE OR REPLACE TABLE diff_result AS"))
    assert(sql.trim.linesIterator.size == 1) // flattened
    assert(!sql.contains("--"))
    assert(sql.contains("FROM example.before"))
    assert(sql.contains("IS NOT DISTINCT FROM"))
    // stack: appended AFTER existing content (reference "prepend" that
    // actually appends — tests/test_diffgen.py:241-249)
    val stackLines = Files.readString(stack).trim.linesIterator.toSeq
    assert(stackLines.head == "SELECT 1;")
    assert(stackLines.last.contains("diff_result"))
    assert(stackLines.size == 2)
  }

  test("emitted SQL executed by Spark ≡ native TableDiff operator") {
    import spark.implicits._
    val before = Seq((1, "a"), (2, "b"), (3, "c")).toDF("K1", "VAL")
    val after = Seq((1, "a"), (2, "x"), (4, "d")).toDF("K1", "VAL")
    before.createOrReplaceTempView("diffgen_b")
    after.createOrReplaceTempView("diffgen_a")
    val sql = DiffSql.generate(
      "SELECT * FROM diffgen_b",
      "SELECT * FROM diffgen_a",
      Seq("K1"), Seq("K1", "VAL"), Seq("K1", "VAL"))
    val viaSql = spark.sql(sql)
    val viaOperator = TableDiff.diff(before, after, Seq("K1"),
      opts = DiffOptions(upperCase = true))
    assert(viaSql.columns.toSeq == viaOperator.columns.toSeq)
    assert(viaSql.exceptAll(viaOperator).isEmpty &&
      viaOperator.exceptAll(viaSql).isEmpty)
  }

  test("--dedup_keys emits the collapse form; executed SQL ≡ native dedup mode") {
    import spark.implicits._
    // CLI surface: the flag lands the GROUP BY collapse + multiplicity
    // tail in the emitted text
    val b = tmpCsv("example_before.csv", beforeCsv)
    val a = tmpCsv("example_after.csv", afterCsv)
    val k = tmpCsv("example_keys.csv", keysCsv)
    val out = Files.createTempDirectory("diffgen").resolve("diff.sql")
    DiffGen.main(Array(
      b.toString, a.toString, "--keys", k.toString,
      "--out", out.toString, "--dedup_keys"))
    val cliSql = Files.readString(out)
    assert(cliSql.contains("_dup_before") && cliSql.contains("_dup_status"))
    assert(cliSql.contains("GROUP BY"))
    // semantics: the emitted SQL executed by Spark ≡ the native
    // operator in dedup mode, duplicate keys included
    val before = Seq((1, "a"), (1, "b"), (2, "c")).toDF("K1", "VAL")
    val after = Seq((1, "x"), (1, "y"), (4, "d")).toDF("K1", "VAL")
    before.createOrReplaceTempView("diffgen_db")
    after.createOrReplaceTempView("diffgen_da")
    val sql = DiffSql.generate(
      "SELECT * FROM diffgen_db",
      "SELECT * FROM diffgen_da",
      Seq("K1"), Seq("K1", "VAL"), Seq("K1", "VAL"),
      dedupDuplicateKeys = true)
    val viaSql = spark.sql(sql)
    val viaOperator = TableDiff.diff(before, after, Seq("K1"),
      opts = DiffOptions(upperCase = true, dedupDuplicateKeys = true))
    assert(viaSql.columns.map(_.toLowerCase).toSeq ==
      viaOperator.columns.map(_.toLowerCase).toSeq)
    val aligned = viaOperator.toDF(viaSql.columns.toIndexedSeq: _*)
    assert(viaSql.exceptAll(aligned).isEmpty && aligned.exceptAll(viaSql).isEmpty)
  }

  test("--abs_tol applies the tolerance predicate to exactly the NUMBER-classed columns") {
    import spark.implicits._
    // schema CSVs: K1 + VAL (NUMBER) + NOTE (VARCHAR → TEXT class)
    val schemaCsv = "name,type\nK1,\"NUMBER(38,0)\"\nVAL,FLOAT\nNOTE,VARCHAR(16)"
    val b = tmpCsv("tol_before.csv", schemaCsv)
    val a = tmpCsv("tol_after.csv", schemaCsv)
    val k = tmpCsv("tol_keys.csv", "name,type\nK1,\"NUMBER(38,0)\"")
    val out = Files.createTempDirectory("diffgen").resolve("diff.sql")
    DiffGen.main(Array(
      b.toString, a.toString, "--keys", k.toString,
      "--out", out.toString, "--abs_tol", "0.01"))
    val cliSql = Files.readString(out)
    // FLOAT-family columns get the double-cast ABS predicate, exact
    // NUMBER(p,s) columns the native-subtraction spelling (operand
    // double-casts collapse distinct values beyond 2^53 — ADVICE r12),
    // TEXT ones stay =
    assert(cliSql.contains("ABS(CAST(b_VAL AS DOUBLE) - CAST(a_VAL AS DOUBLE)) <= 0.01"))
    assert(cliSql.contains("CAST(ABS(b_K1 - a_K1) AS DOUBLE) <= 0.01"))
    assert(cliSql.contains("b_NOTE = a_NOTE"))
    // semantics: the emitted SQL executed by Spark ≡ the native
    // toleranced operator (within-tolerance drift reads 0)
    val before = Seq((1, 100.0, "a"), (2, 100.0, "b")).toDF("K1", "VAL", "NOTE")
    val after = Seq((1, 100.005, "a"), (2, 105.0, "b")).toDF("K1", "VAL", "NOTE")
    before.createOrReplaceTempView("diffgen_tb")
    after.createOrReplaceTempView("diffgen_ta")
    val sql = DiffSql.generate(
      "SELECT * FROM diffgen_tb",
      "SELECT * FROM diffgen_ta",
      Seq("K1"), Seq("K1", "VAL", "NOTE"), Seq("K1", "VAL", "NOTE"),
      // the operator tolerances FRACTIONAL columns only (r13): VAL is
      // the one toleranced column; integral K1 compares exact
      numericAbsTol = Some(0.01), absTolCols = Set("VAL"))
    val viaSql = spark.sql(sql)
    val viaOperator = TableDiff.diff(before, after, Seq("K1"),
      opts = DiffOptions(upperCase = true, numericAbsTol = Some(0.01)))
    assert(viaSql.columns.toSeq == viaOperator.columns.toSeq)
    assert(viaSql.exceptAll(viaOperator).isEmpty &&
      viaOperator.exceptAll(viaSql).isEmpty)
    // a schema with no NUMBER columns rejects the flag with a remedy
    val bt = tmpCsv("tol2_before.csv", "name,type\nK1,VARCHAR(8)\nNOTE,VARCHAR(16)")
    val at = tmpCsv("tol2_after.csv", "name,type\nK1,VARCHAR(8)\nNOTE,VARCHAR(16)")
    val kt = tmpCsv("tol2_keys.csv", "name,type\nK1,VARCHAR(8)")
    val e = intercept[IllegalArgumentException] {
      DiffGen.buildSql(DiffGen.parseArgs(Seq(
        bt.toString, at.toString, "--keys", kt.toString, "--abs_tol", "0.5")))
    }
    assert(e.getMessage.contains("NUMBER-classed"))
    // NESTED numeric types must NOT get the predicate: ARRAY<INT>
    // substring-classes NUMBER, but ABS/CAST over it fails at
    // execution in both engines — scalar types only
    val bn = tmpCsv("tol3_before.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,FLOAT\nSCORES,ARRAY<INT>")
    val an = tmpCsv("tol3_after.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,FLOAT\nSCORES,ARRAY<INT>")
    val kn = tmpCsv("tol3_keys.csv", "name,type\nK1,\"NUMBER(38,0)\"")
    val nestedSql = DiffGen.buildSql(DiffGen.parseArgs(Seq(
      bn.toString, an.toString, "--keys", kn.toString, "--abs_tol", "0.01")))
    assert(nestedSql.contains("ABS(CAST(b_VAL AS DOUBLE)"))
    assert(!nestedSql.contains("ABS(CAST(b_SCORES"), "nested types must stay =")
    // a negative (or NaN) tolerance is a silent everything-differs
    // misconfiguration — rejected with the consequence named
    val neg = intercept[IllegalArgumentException] {
      DiffGen.buildSql(DiffGen.parseArgs(Seq(
        b.toString, a.toString, "--keys", k.toString, "--abs_tol", "-0.01")))
    }
    assert(neg.getMessage.contains("non-negative"), neg.getMessage)
  }

  test("--abs_tol classes via the parsed type: NUMERIC counts, INTERVAL-ish does not (ADVICE r14)") {
    // NUMERIC(p,s) is a spelling parseCsvType explicitly accepts as a
    // decimal, but the old substring classing (NUMBER|INT|FLOAT|...)
    // missed it — the column was silently compared exactly while its
    // NUMBER(p,s) twin got the tolerance. Classing now rides the
    // parsed DataType, so NUMERIC takes the exact-subtraction
    // spelling; and an unparseable future spelling containing 'INT'
    // (INTERVAL) classes non-numeric instead of substring-matching
    // into an ABS() that fails at execution.
    val b = tmpCsv("toln_before.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,\"NUMERIC(10,2)\"\nSPAN,INTERVAL")
    val a = tmpCsv("toln_after.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,\"NUMERIC(10,2)\"\nSPAN,INTERVAL")
    val k = tmpCsv("toln_keys.csv", "name,type\nK1,\"NUMBER(38,0)\"")
    val sql = DiffGen.buildSql(DiffGen.parseArgs(Seq(
      b.toString, a.toString, "--keys", k.toString, "--abs_tol", "0.01")))
    assert(sql.contains("CAST(ABS(b_VAL - a_VAL) AS DOUBLE) <= 0.01"),
      "NUMERIC(10,2) must take the exact native-subtraction tolerance")
    assert(!sql.contains("ABS(b_SPAN") && !sql.contains("ABS(CAST(b_SPAN"),
      "INTERVAL must not class numeric via the 'INT' substring")
    assert(sql.contains("b_SPAN = a_SPAN"))
    // FLOAT(p) — the parameterized binary-float spelling the old
    // substring classing accepted — must keep its double-cast
    // tolerance under the parsed-type classing (review r15)
    val bf = tmpCsv("tolf_before.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,\"FLOAT(53)\"")
    val af = tmpCsv("tolf_after.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,\"FLOAT(53)\"")
    val kf = tmpCsv("tolf_keys.csv", "name,type\nK1,\"NUMBER(38,0)\"")
    val fsql = DiffGen.buildSql(DiffGen.parseArgs(Seq(
      bf.toString, af.toString, "--keys", kf.toString, "--abs_tol", "0.01")))
    assert(fsql.contains("ABS(CAST(b_VAL AS DOUBLE) - CAST(a_VAL AS DOUBLE)) <= 0.01"),
      "FLOAT(53) must take the float-family double-cast tolerance")
  }

  test("--abs_tol classes evolved columns by their WIDENED comparison type (ADVICE r13)") {
    import spark.implicits._
    // VAL evolves NUMBER(9,2) → VARCHAR: both projections cast to
    // STRING, so the comparison is textual and the tolerance predicate
    // must not touch it (previously the NUMBER-side spelling landed it
    // in the exact set → ABS() over strings: DuckDB errors, Spark
    // silently coerces, contradicting the textual-equality pin).
    // AMT evolves NUMBER(9,2) → FLOAT: widens to DOUBLE, so it must
    // take the FLOAT-class double-cast spelling despite the NUMBER
    // spelling on the before side.
    val b = tmpCsv("tolw_before.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,\"NUMBER(9,2)\"\nAMT,\"NUMBER(9,2)\"")
    val a = tmpCsv("tolw_after.csv",
      "name,type\nK1,\"NUMBER(38,0)\"\nVAL,VARCHAR(16)\nAMT,FLOAT")
    val k = tmpCsv("tolw_keys.csv", "name,type\nK1,\"NUMBER(38,0)\"")
    val sql = DiffGen.buildSql(DiffGen.parseArgs(Seq(
      b.toString, a.toString, "--keys", k.toString, "--abs_tol", "0.01")))
    assert(!sql.contains("b_VAL - a_VAL"), "STRING-widened column must stay =")
    assert(sql.contains("ABS(CAST(b_AMT AS DOUBLE) - CAST(a_AMT AS DOUBLE)) <= 0.01"))
    // and the emitted SQL actually RUNS in Spark with the evolved
    // table shapes, with textual semantics on VAL ('5.10' vs 5.10
    // cast to '5.10' agree; '05' vs 5.00 differ textually)
    Seq((1L, BigDecimal("5.10"), BigDecimal("1.00")))
      .toDF("K1", "VAL", "AMT")
      .selectExpr("K1", "CAST(VAL AS DECIMAL(9,2)) AS VAL", "CAST(AMT AS DECIMAL(9,2)) AS AMT")
      .createOrReplaceTempView("tolw_tb")
    Seq((1L, "5.10", 1.005f)).toDF("K1", "VAL", "AMT")
      .createOrReplaceTempView("tolw_ta")
    val innerSql = sql
      .replaceFirst("(?s)^CREATE OR REPLACE TABLE diff_result AS\\s*", "")
      .replace("tolw.before", "tolw_tb")
      .replace("tolw.after", "tolw_ta")
    val res = spark.sql(innerSql)
    val row = res.where("K_K1 = 1").collect().head
    assert(row.getAs[Int]("VAL") == 0, "textually equal strings must read 0")
    assert(row.getAs[Int]("AMT") == 0, "within-tolerance double drift must read 0")
  }

  test("dedup mode rejects reserved _dup_* input columns at GENERATION time") {
    // without the guard, an input column named _dup_before makes the
    // collapse CTE emit two same-aliased columns — failing only when
    // the SQL is executed, far from the misuse (ADVICE r11)
    val e = intercept[IllegalArgumentException] {
      DiffSql.generate(
        "SELECT * FROM b", "SELECT * FROM a",
        Seq("K1"), Seq("K1", "_DUP_BEFORE"), Seq("K1"),
        dedupDuplicateKeys = true)
    }
    assert(e.getMessage.toLowerCase.contains("_dup_before"))
    // non-dedup mode: the same column is ordinary data, no guard
    val sql = DiffSql.generate(
      "SELECT * FROM b", "SELECT * FROM a",
      Seq("K1"), Seq("K1", "_DUP_BEFORE"), Seq("K1"))
    assert(sql.contains("_DUP_BEFORE"))
  }
}
