package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema utilities for the diff engine.
  *
  * Mirrors the reference generator's column-universe logic
  * (reference: checkatron/diffgen.py:76-80 — ordered union of
  * before/after column names), re-expressed over Spark StructTypes
  * instead of DESCRIBE-TABLE CSVs.
  */
object SchemaUtils {

  /** Order-preserving, case-insensitive union of column names:
    * all before-side columns in order, then after-only columns in
    * their order (reference: diffgen.py:76-80). Name casing of the
    * first side seen wins; the reference upper-cases everything for
    * Snowflake, which we make an opt-in (DiffOptions.upperCase).
    */
  def mergeColumns(before: Seq[String], after: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val seen = scala.collection.mutable.HashSet[String]()
    (before ++ after).foreach { c =>
      if (seen.add(c.toLowerCase)) out += c
    }
    out.toSeq
  }

  /** The union column list with a DataType for each: the side's own
    * type when the column exists on one side only (it types the
    * literal-NULL padding — reference: full_compare.sql.j2:45,52), and
    * the [[widen]]ed common type when it exists on BOTH sides. Until
    * r13 a both-sides column silently took the before type, leaving
    * the status cell's `b = a` to each engine's implicit-coercion
    * rules for the single most common migration change (INT→BIGINT,
    * DECIMAL(15,2)→(18,4), INT→VARCHAR) — exactly the cross-engine
    * seam the reference never decides (its template compares the raw
    * columns and lets Snowflake coerce, full_compare.sql.j2:82). The
    * engine decides: compare under an explicit lossless widening where
    * one exists, fail fast with the type pair and a remedy where none
    * does.
    */
  def mergeColumnTypes(before: StructType, after: StructType): Seq[(String, DataType)] = {
    def typeOf(s: StructType, name: String): Option[DataType] =
      s.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    mergeColumns(before.fieldNames.toSeq, after.fieldNames.toSeq).map { c =>
      (typeOf(before, c), typeOf(after, c)) match {
        case (Some(bt), Some(at)) =>
          c -> widen(bt, at).getOrElse(throw new IllegalArgumentException(
            s"column '$c' changed type incomparably: ${bt.catalogString} (before) vs " +
              s"${at.catalogString} (after) — no lossless, engine-independent common " +
              "type exists for this pair; cast one side explicitly before diffing " +
              "(or drop the column from both sides)"))
        case (bt, at) => c -> bt.orElse(at).get
      }
    }
  }

  /** Per-column type changes between two schemas: (column, beforeType,
    * afterType, widened common type if one exists). Feeds both the
    * diff's widening casts and [[DiffSummary.schemaDrift]]'s
    * type-changed report; columns typed identically on both sides are
    * not listed.
    */
  def typeChanges(
      before: StructType,
      after: StructType): Seq[(String, DataType, DataType, Option[DataType])] = {
    def typeOf(s: StructType, name: String): Option[DataType] =
      s.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    mergeColumns(before.fieldNames.toSeq, after.fieldNames.toSeq).flatMap { c =>
      (typeOf(before, c), typeOf(after, c)) match {
        case (Some(bt), Some(at)) if !sameTypeIgnoringNullability(bt, at) =>
          Some((c, bt, at, widen(bt, at)))
        case _ => None
      }
    }
  }

  /** Decimal digits needed to hold any value of an integral type. */
  private def intDigits(dt: DataType): Int = dt match {
    case ByteType => 3
    case ShortType => 5
    case IntegerType => 10
    case LongType => 19
    case _ => throw new IllegalArgumentException(s"not integral: ${dt.catalogString}")
  }

  private val integralOrder: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType)

  /** The explicit common comparison type for a same-column type change
    * — THE widening matrix, pinned so neither engine's implicit
    * coercion decides a status cell (TableDiffSpec rows per cell):
    *
    *   - integral ↔ integral → the wider integral (every value
    *     round-trips);
    *   - integral ↔ DECIMAL(p,s) → DECIMAL(max(p−s, digits)+s, s)
    *     capped at 38 — exact for both sides (fails fast if the cap
    *     would truncate integer digits);
    *   - DECIMAL ↔ DECIMAL → DECIMAL(max(p1−s1, p2−s2)+max(s1,s2),
    *     max(s1,s2)) capped at 38, same exactness rule;
    *   - any numeric ↔ FLOAT/DOUBLE → DOUBLE. FLOAT→DOUBLE is exact;
    *     integers/decimals beyond 2^53 are NOT exactly representable —
    *     the IEEE round is identical in every engine, so the cell is
    *     deterministic, but two long values 1 apart above 2^53 can
    *     read equal. That is the established FLOAT-column contract
    *     ([[DiffOptions.numericAbsTol]] documents the same bound);
    *   - DATE ↔ TIMESTAMP_NTZ → TIMESTAMP_NTZ (dates compare at
    *     midnight — both engines' documented DATE→TIMESTAMP cast);
    *   - STRING ↔ integral/DECIMAL/BOOLEAN/DATE/TIMESTAMP_NTZ →
    *     STRING via explicit cast: those types' text forms are
    *     engine-independent (probed: DuckDB and Spark render
    *     integers, full-scale decimals, 'true'/'false', ISO dates and
    *     microsecond timestamps identically);
    *   - STRING ↔ FLOAT/DOUBLE → NONE: float text forms are
    *     engine-dependent (scientific-notation thresholds differ) —
    *     fail fast rather than let formatting decide equality;
    *   - anything else (nested ↔ anything, BINARY ↔ STRING, …) →
    *     NONE → [[mergeColumnTypes]] fails fast with the remedy.
    */
  def widen(bt: DataType, at: DataType): Option[DataType] = {
    def decimalFor(idigits: Int, scale: Int): Option[DataType] = {
      val p = idigits + scale
      if (p <= 38) Some(DecimalType(p, scale)) else None
    }
    (bt, at) match {
      // nullability flags (incl. nested containsNull/field nullable)
      // are NOT a type change — file-source reads force everything
      // nullable, and the diff's NULL branches already handle nulls
      case _ if sameTypeIgnoringNullability(bt, at) => Some(bt)
      case (b: DecimalType, a: DecimalType) =>
        decimalFor(math.max(b.precision - b.scale, a.precision - a.scale),
          math.max(b.scale, a.scale))
      case (b, a: DecimalType) if integralOrder.contains(b) =>
        decimalFor(math.max(intDigits(b), a.precision - a.scale), a.scale)
      case (b: DecimalType, a) if integralOrder.contains(a) =>
        decimalFor(math.max(intDigits(a), b.precision - b.scale), b.scale)
      case (b, a) if integralOrder.contains(b) && integralOrder.contains(a) =>
        Some(integralOrder(math.max(integralOrder.indexOf(b), integralOrder.indexOf(a))))
      case (b, a)
          if (b == FloatType || b == DoubleType) && isNumeric(a) ||
            (a == FloatType || a == DoubleType) && isNumeric(b) =>
        Some(DoubleType)
      case (DateType, TimestampNTZType) | (TimestampNTZType, DateType) =>
        Some(TimestampNTZType)
      case (StringType, other) if stringable(other) => Some(StringType)
      case (other, StringType) if stringable(other) => Some(StringType)
      case _ => None
    }
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Structural type equality with every nullability flag (and field
    * metadata) erased — the "did the TYPE change" predicate.
    */
  def sameTypeIgnoringNullability(a: DataType, b: DataType): Boolean =
    nullNormalized(a) == nullNormalized(b)

  private def nullNormalized(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(nullNormalized(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(nullNormalized(k), nullNormalized(v), valueContainsNull = true)
    case s: StructType =>
      StructType(s.fields.map(f =>
        StructField(f.name, nullNormalized(f.dataType), nullable = true)))
    case other => other
  }

  /** Types whose CAST-to-STRING text form is engine-independent
    * (floats are NOT: scientific-notation thresholds differ).
    */
  private def stringable(dt: DataType): Boolean = dt match {
    case _: DecimalType | ByteType | ShortType | IntegerType | LongType |
        BooleanType | DateType | TimestampNTZType => true
    case _ => false
  }

  /** Dual-dialect SQL spelling of a widened type, for the
    * [[DiffSql.generate]] twin's explicit casts — every name here
    * parses identically in Spark AND DuckDB (`STRING` is a documented
    * DuckDB alias of VARCHAR; `TIMESTAMP` is DuckDB's native NTZ type
    * and is only emitted for DATE↔TIMESTAMP_NTZ widening, where the
    * oracle side is what the spelling serves).
    */
  def sqlTypeName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "STRING"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case BooleanType => "BOOLEAN"
    case other => throw new IllegalArgumentException(
      s"no dual-dialect spelling for ${other.catalogString}")
  }

  /** Case-insensitive column lookup that returns the schema's own
    * casing, so user-supplied key names resolve like Spark's default
    * case-insensitive analyzer.
    */
  def resolve(df: DataFrame, name: String): String =
    df.columns
      .find(_.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found in [${df.columns.mkString(", ")}]"))
}
