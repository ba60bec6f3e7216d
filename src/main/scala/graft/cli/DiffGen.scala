package graft.cli

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.operators.DiffSql

/** Drop-in equivalent of the reference CLI (`python -m
  * checkatron.diffgen` — reference: checkatron/diffgen.py): read
  * Snowflake DESCRIBE-format schema CSVs, emit the diff SQL text.
  *
  * Our engine executes the diff natively ([[graft.operators.TableDiff]]);
  * this tool reproduces the reference's generate-SQL workflow for
  * audit and migration compatibility:
  *
  *   - positional args: before-schema CSV, after-schema CSV
  *     (diffgen.py:52-55)
  *   - `--keys` keys CSV (same format, rows = key columns, diffgen.py:73)
  *   - `--before_where/--after_where` opaque predicate strings
  *     (diffgen.py:56-57)
  *   - `--before_table/--after_table` overrides; otherwise inferred
  *     from the CSV filename stem with `_`→`.` (diffgen.py:86-94)
  *   - `--out` (default diff.sql), `--single_line`, `--stack_input`
  *   - `--dedup_keys` emit the duplicate-key collapse form
  *     ([[graft.operators.DiffSql.generate]] `dedupDuplicateKeys`) —
  *     an extension past the reference CLI, mirroring
  *     `DiffOptions.dedupDuplicateKeys`
  *     (diffgen.py:58-66,120-140)
  *   - `--abs_tol <d>` emit the toleranced numeric comparison
  *     (|b−a| ≤ d reads as equal) for every NUMBER-classed column —
  *     the one place the reference's otherwise-dead TEXT/NUMBER
  *     type classing (G2) genuinely pays off: the schema CSVs name
  *     which columns get the tolerance predicate, mirroring
  *     `DiffOptions.numericAbsTol`
  */
object DiffGen {

  final case class Config(
      beforeCsv: String,
      afterCsv: String,
      keysCsv: String,
      beforeWhere: Option[String] = None,
      afterWhere: Option[String] = None,
      beforeTable: Option[String] = None,
      afterTable: Option[String] = None,
      out: String = "diff.sql",
      singleLine: Boolean = false,
      stackInput: Option[String] = None,
      dedupKeys: Boolean = false,
      absTol: Option[Double] = None)

  /** RFC-4180-style CSV line split: handles quoted cells (so Snowflake
    * types like `"NUMBER(38,0)"` keep their embedded comma) and `""`
    * escapes. The reference uses Python's csv module; a raw
    * `split(",")` would shift every cell after the first quoted type.
    */
  private[cli] def splitCsvLine(line: String): Seq[String] = {
    val cells = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') inQuotes = false
        else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => cells += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    cells += cur.result()
    cells.toSeq
  }

  /** Schema-descriptor CSV loader (G1, diffgen.py:30-34): Snowflake
    * `DESCRIBE TABLE` download format; only `name` and `type` are
    * consumed, extra columns optional (tests use truncated headers).
    * Names are upper-cased (diffgen.py:73).
    */
  def loadSchemaCsv(path: String): Seq[(String, String)] = {
    val lines = Files.readAllLines(Paths.get(path)).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty)
    require(lines.nonEmpty, s"empty schema csv: $path")
    val header = splitCsvLine(lines.head).map(_.trim.toLowerCase)
    val nameIdx = header.indexOf("name")
    val typeIdx = header.indexOf("type")
    require(nameIdx >= 0, s"schema csv $path has no 'name' column")
    lines.tail.map { line =>
      val cells = splitCsvLine(line)
      val name = cells(nameIdx).trim.toUpperCase
      val tpe = if (typeIdx >= 0 && typeIdx < cells.length) cells(typeIdx).trim else ""
      name -> tpe
    }
  }

  /** V8 inverse of [[loadSchemaCsv]]: emit a Spark schema in the
    * Snowflake-DESCRIBE download format the reference consumes
    * (diffgen.py:30-34 — `name,type` header, one row per column,
    * external type names). The type mapping follows Snowflake's
    * documented equivalents so [[typeClass]] classes the result the
    * same way it classes a real DESCRIBE download: all integral and
    * fractional types land in NUMBER, strings in TEXT.
    */
  def describeCsv(schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    def sfType(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "NUMBER(38,0)"
      case FloatType | DoubleType => "FLOAT"
      case d: DecimalType => s"NUMBER(${d.precision},${d.scale})"
      case StringType => "VARCHAR(16777216)"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP_LTZ(9)"
      case TimestampNTZType => "TIMESTAMP_NTZ(9)"
      case BinaryType => "BINARY(8388608)"
      case other => other.sql // structured types have no CSV-era equivalent
    }
    // quote cells with embedded commas (NUMBER(38,0)) exactly like the
    // real DESCRIBE downloads — splitCsvLine reverses it
    def cell(s: String): String = if (s.contains(',')) "\"" + s + "\"" else s
    ("name,type" +: schema.fields.toSeq.map(f => s"${f.name.toUpperCase},${cell(sfType(f.dataType))}"))
      .mkString("\n")
  }

  /** Type classing (G2, diffgen.py:37-47): collapse the external type
    * system to TEXT vs NUMBER by substring match; fallback TEXT. The
    * live template never consumes it (dead parameter in the
    * reference), kept for API parity.
    */
  def typeClass(sqlType: String): String = {
    val t = sqlType.toUpperCase
    if (Seq("NUMBER", "INT", "FLOAT", "DECIMAL").exists(t.contains)) "NUMBER"
    else "TEXT"
  }

  /** DESCRIBE-era type string → Spark DataType, for the type-change
    * widening mirror ([[graft.operators.SchemaUtils.widen]] drives
    * both the native operator and this CLI path from ONE matrix).
    * Partial inverse of [[describeCsv]] — DESCRIBE collapses every
    * integral to NUMBER(38,0), so integrals come back as exact
    * decimals, which widen identically. None = unknown/unmapped
    * (structured CSV-era spellings): such a column fails fast if its
    * type CHANGED, and is left untouched otherwise.
    */
  private[cli] def parseCsvType(t: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val u = t.trim.toUpperCase
    val decimal = """(?:NUMBER|DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r
    // FLOAT(p) — the PostgreSQL/Oracle DESCRIBE spelling of binary
    // floats (p = mantissa bits, not decimal digits): any precision
    // maps to DOUBLE, like the bare FLOAT spellings below (review
    // r15: the substring-era classing accepted it; the parsed path
    // must not silently drop it out of --abs_tol treatment)
    val floatParam = """FLOAT\s*\(\s*\d+\s*\)""".r
    u match {
      case decimal(p, s) => Some(DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0)))
      case "NUMBER" | "DECIMAL" | "NUMERIC" => Some(DecimalType(38, 0))
      case t if floatParam.pattern.matcher(t).matches() => Some(DoubleType)
      case "TINYINT" => Some(ByteType)
      case "SMALLINT" => Some(ShortType)
      case "INT" | "INTEGER" => Some(IntegerType)
      case "BIGINT" => Some(LongType)
      case "FLOAT" | "FLOAT4" | "FLOAT8" | "DOUBLE" | "REAL" | "DOUBLE PRECISION" =>
        Some(DoubleType)
      case "BOOLEAN" => Some(BooleanType)
      case "DATE" => Some(DateType)
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") ||
          s.startsWith("TEXT") || s == "STRING" => Some(StringType)
      case s if s.startsWith("TIMESTAMP_NTZ") || s == "TIMESTAMP" ||
          s.startsWith("TIMESTAMP(") || s.startsWith("DATETIME") =>
        Some(TimestampNTZType)
      case s if s.startsWith("TIMESTAMP_LTZ") || s.startsWith("TIMESTAMP_TZ") =>
        Some(TimestampType)
      case s if s.startsWith("BINARY") => Some(BinaryType)
      case _ => None
    }
  }

  /** Table-name inference (G4, diffgen.py:86-94): CSV filename stem,
    * `_` → `.` (e.g. example_before.csv → example.before).
    */
  def inferTableName(csvPath: String): String = {
    val fname = Paths.get(csvPath).getFileName.toString
    val stem = fname.stripSuffix(".csv")
    stem.replace('_', '.')
  }

  /** Build the full SQL text (CTAS form, like the reference template's
    * `CREATE OR REPLACE TABLE diff_result AS` — full_compare.sql.j2:10).
    */
  def buildSql(cfg: Config): String = {
    val beforeSchema = loadSchemaCsv(cfg.beforeCsv)
    val afterSchema = loadSchemaCsv(cfg.afterCsv)
    val beforeCols = beforeSchema.map(_._1)
    val afterCols = afterSchema.map(_._1)
    val keys = loadSchemaCsv(cfg.keysCsv).map(_._1)
    require(keys.nonEmpty, "at least one key column required")
    val beforeTable = cfg.beforeTable.getOrElse(inferTableName(cfg.beforeCsv))
    val afterTable = cfg.afterTable.getOrElse(inferTableName(cfg.afterCsv))
    // type-evolution mirror (r13): a column on BOTH sides whose CSV
    // types differ gets explicit casts to the widened common type
    // (SchemaUtils.widen — the same matrix the native operator uses),
    // and FAILS FAST with the type pair + remedy where none exists —
    // the reference leaves this to the warehouse's implicit coercion
    // (full_compare.sql.j2:82), exactly the cross-engine seam this
    // engine pins instead. Computed BEFORE the --abs_tol classing:
    // tolerance applies to the COMPARISON type, which for an evolved
    // column is the widened target, not either side's spelling.
    val afterTypes = afterSchema.toMap
    val castTypes: Map[String, String] = beforeSchema.flatMap { case (c, bt) =>
      afterTypes.get(c).filter(at => !at.equalsIgnoreCase(bt)).map { at =>
        import graft.operators.SchemaUtils
        (parseCsvType(bt), parseCsvType(at)) match {
          case (Some(bdt), Some(adt))
              if SchemaUtils.sameTypeIgnoringNullability(bdt, adt) =>
            None // spelling drift only (NUMBER(10,0) vs DECIMAL(10,0))
          case (Some(bdt), Some(adt)) =>
            SchemaUtils.widen(bdt, adt) match {
              case Some(w) => Some(c -> SchemaUtils.sqlTypeName(w))
              case None => throw new IllegalArgumentException(
                s"column '$c' changed type incomparably: $bt (before) vs $at (after) — " +
                  "no lossless, engine-independent common type exists for this pair; " +
                  "cast one side explicitly before diffing (or drop the column from " +
                  "both sides)")
            }
          case _ => throw new IllegalArgumentException(
            s"column '$c' changed type but at least one spelling is not a " +
              s"recognized DESCRIBE-era scalar type: $bt (before) vs $at (after) — " +
              "cast one side explicitly before diffing")
        }
      }
    }.flatten.toMap
    // --abs_tol: the NUMBER-classed columns (the reference's G2
    // classing, finally load-bearing) get the tolerance predicate —
    // SCALAR types only: the substring classing would also catch a
    // nested ARRAY<INT>/STRUCT<...FLOAT...> (describeCsv's fallback
    // spelling), whose ABS/CAST predicate fails at execution in both
    // engines. DESCRIBE-era scalar types never contain '<'.
    // Columns with a type evolution class by their WIDENED castTypes
    // target (the type both projections actually compare under) —
    // a NUMBER→VARCHAR column widens to STRING and compares
    // textually, so no tolerance predicate (ADVICE r13: classing it
    // off the NUMBER-side spelling emitted ABS() over strings, which
    // DuckDB rejects and Spark silently coerces); a NUMBER→FLOAT
    // column widens to DOUBLE and must take the double-cast spelling
    // even though one side spelled NUMBER.
    // FLOAT-family columns get the double-cast spelling; NUMBER/
    // DECIMAL/INT-family columns get the exact native-subtraction
    // spelling (ADVICE r12: double-casting exact-typed OPERANDS
    // collapses distinct values beyond 2^53 — NUMBER(38,0) is the
    // DESCRIBE spelling of both integers and wide decimals, so the
    // CSV path cannot and need not distinguish them).
    val (floatCols, exactCols) = cfg.absTol.fold(
      (Set.empty[String], Set.empty[String])) { d =>
      DiffSql.validateAbsTol(d, "--abs_tol")
      // Classed via parseCsvType's parsed DataType, not substrings
      // (ADVICE r14: the substring list omitted the 'NUMERIC'
      // spelling parseCsvType itself accepts as a decimal, and 'INT'
      // would over-match any future spelling containing it, e.g.
      // INTERVAL). parseCsvType covers both the DESCRIBE-era
      // spellings and the Spark sqlTypeName spellings castTypes
      // emits (DOUBLE/BIGINT/DECIMAL(p,s)); nested types and unknown
      // spellings parse to None and class non-numeric, preserving
      // the no-'<' guard.
      def numericScalar(t: String): Boolean =
        parseCsvType(t).exists(_.isInstanceOf[org.apache.spark.sql.types.NumericType])
      val scalars = (beforeSchema ++ afterSchema)
        .map { case (c, t) => (c, castTypes.getOrElse(c, t)) }
        .filter { case (_, t) => numericScalar(t) }
      val (fl, ex) = scalars.partition { case (_, t) =>
        parseCsvType(t).contains(org.apache.spark.sql.types.DoubleType)
      }
      require(
        scalars.nonEmpty,
        "--abs_tol given but the schemas have no scalar NUMBER-classed columns")
      (fl.map(_._1).toSet, ex.map(_._1).toSet)
    }
    def body(table: String, where: Option[String]): String =
      s"SELECT * FROM $table" + where.map(w => s" WHERE $w").getOrElse("")
    val query = DiffSql.generate(
      beforeBody = body(beforeTable, cfg.beforeWhere),
      afterBody = body(afterTable, cfg.afterWhere),
      keys = keys,
      beforeCols = beforeCols,
      afterCols = afterCols,
      dedupDuplicateKeys = cfg.dedupKeys,
      numericAbsTol = cfg.absTol,
      absTolCols = floatCols,
      absTolDecimalCols = exactCols,
      castTypes = castTypes)
    s"CREATE OR REPLACE TABLE diff_result AS\n$query"
  }

  def parseArgs(args: Seq[String]): Config = {
    val positional = scala.collection.mutable.ArrayBuffer[String]()
    var cfg = Config("", "", "")
    var i = 0
    def value(flag: String): String = {
      require(i + 1 < args.length, s"$flag requires a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case f @ "--keys" => cfg = cfg.copy(keysCsv = value(f)); i += 2
        case f @ "--before_where" => cfg = cfg.copy(beforeWhere = Some(value(f))); i += 2
        case f @ "--after_where" => cfg = cfg.copy(afterWhere = Some(value(f))); i += 2
        case f @ "--before_table" => cfg = cfg.copy(beforeTable = Some(value(f))); i += 2
        case f @ "--after_table" => cfg = cfg.copy(afterTable = Some(value(f))); i += 2
        case f @ "--out" => cfg = cfg.copy(out = value(f)); i += 2
        case "--single_line" => cfg = cfg.copy(singleLine = true); i += 1
        case "--dedup_keys" => cfg = cfg.copy(dedupKeys = true); i += 1
        case f @ "--abs_tol" => cfg = cfg.copy(absTol = Some(value(f).toDouble)); i += 2
        case f @ "--stack_input" => cfg = cfg.copy(stackInput = Some(value(f))); i += 2
        case p => positional += p; i += 1
      }
    }
    require(positional.length == 2, "usage: DiffGen <before.csv> <after.csv> --keys <keys.csv> [...]")
    require(cfg.keysCsv.nonEmpty, "--keys is required")
    cfg.copy(beforeCsv = positional(0), afterCsv = positional(1))
  }

  def run(cfg: Config): String = {
    val sql = buildSql(cfg)
    val outSql = if (cfg.singleLine) DiffSql.flatten(sql) else sql
    Files.writeString(Paths.get(cfg.out), outSql + "\n")
    // G7 (diffgen.py:135-140): APPEND the single-line statement to the
    // FIFO stack file (the reference's test calls it "prepend" but the
    // code appends — tests/test_diffgen.py:241-249 assert last line)
    cfg.stackInput.foreach { stack =>
      Files.writeString(
        Paths.get(stack),
        DiffSql.flatten(sql) + "\n",
        StandardOpenOption.CREATE,
        StandardOpenOption.APPEND)
    }
    outSql
  }

  def main(args: Array[String]): Unit = {
    run(parseArgs(args.toIndexedSeq))
    ()
  }
}
