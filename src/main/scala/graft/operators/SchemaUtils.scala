package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, StructType}

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

  /** The union column list with a DataType for each: the before-side
    * type if the column exists there, else the after-side type. Used
    * to type the literal-NULL padding for columns absent on one side
    * (reference: full_compare.sql.j2:45,52).
    */
  def mergeColumnTypes(before: StructType, after: StructType): Seq[(String, DataType)] = {
    def typeOf(s: StructType, name: String): Option[DataType] =
      s.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    mergeColumns(before.fieldNames.toSeq, after.fieldNames.toSeq).map { c =>
      c -> typeOf(before, c).orElse(typeOf(after, c)).get
    }
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
