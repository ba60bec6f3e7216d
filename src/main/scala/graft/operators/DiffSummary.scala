package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Companion validation/summary queries from the reference's documented
  * workflow (SURVEY.md §2.2 V1–V6): the user runs these against
  * `diff_result` after the diff (reference: README.md:185-197,
  * samples/setup_all.sql:77-117, tools/step_ledger.py:253-259).
  */
object DiffSummary {

  import TableDiff.RowStatus

  /** V1: one-row conditional aggregate over the diff result
    * (README.md:186-193). `legacy` selects the `_row_status = 0`
    * match convention the docs use; default counts matches as
    * `_row_status IS NULL` per the live template (SURVEY.md §0 trap 1).
    *
    * Distributed shape: global partial-aggregate → single-row final;
    * no shuffle of the wide status matrix, only of 5 longs.
    */
  def summary(diff: DataFrame, legacy: Boolean = false): DataFrame = {
    val present =
      if (legacy) col(RowStatus) === 0 else col(RowStatus).isNull
    def countIf(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    diff.agg(
      count(lit(1)).as("total_rows"),
      countIf(present).as("rows_in_both"),
      countIf(col(RowStatus) === TableDiff.MissingInBefore)
        .as("missing_in_before"),
      countIf(col(RowStatus) === TableDiff.MissingInAfter)
        .as("missing_in_after"),
      countIf(present && TableDiff.anyColumnDiffers(diff))
        .as("rows_with_cell_diffs"))
  }

  /** V2: drill-down filter — rows where anything differs (row missing
    * on a side, or any status cell > 0). README.md:196.
    */
  def differingRows(diff: DataFrame): DataFrame =
    diff.filter(col(RowStatus).isNotNull || TableDiff.anyColumnDiffers(diff))

  /** V3: side-by-side verification — bag union of both inputs tagged
    * with a literal source column, schemas aligned with NULL padding
    * (README.md:135-143, samples/setup_all.sql:55-63).
    */
  def sideBySide(before: DataFrame, after: DataFrame): DataFrame =
    before
      .withColumn("source", lit("BEFORE"))
      .unionByName(
        after.withColumn("source", lit("AFTER")),
        allowMissingColumns = true)

  /** V5: per-table row counts with a literal tag (README.md:136-138). */
  def rowCounts(tables: Seq[(String, DataFrame)]): DataFrame =
    tables
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("row_count"))
          .select(lit(name).as("table_name"), col("row_count"))
      }
      .reduce(_.unionByName(_))

  /** Column profile: per-column distinct and NULL counts in one
    * aggregation pass (2N aggregates, single shuffle of partial
    * states). `approx = true` swaps exact distinct counting for
    * HyperLogLog++ (`approx_count_distinct`) — at 100 TB the exact
    * form shuffles per-column value sets, the HLL form shuffles
    * constant-size sketches; use approx for drift monitoring, exact
    * when the counts feed a correctness decision.
    */
  def profile(df: DataFrame, prefix: String = "", approx: Boolean = false): DataFrame = {
    val aggs = df.columns.toSeq.flatMap { c =>
      val nd =
        if (approx) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        nd.as(s"$prefix${c}_n_distinct"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"$prefix${c}_n_nulls"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Profile drift between two relations: side-by-side per-column
    * distinct/NULL counts (the poor-man's schema-drift monitor the
    * reference's summary workflow gestures at — README.md:135-143).
    */
  def profileDrift(before: DataFrame, after: DataFrame, approx: Boolean = false): DataFrame =
    profile(before, "b_", approx).crossJoin(profile(after, "a_", approx))

  /** First-class schema-drift report (r13): one row per column that
    * was added, dropped, or type-changed between the two relations —
    * the report [[profileDrift]] cannot give (value-level counts are
    * blind to a type change that preserves values). Pure schema
    * computation: NO data scan, the result is a literal local
    * relation, so it costs the same at 100 TB as at 100 rows.
    *
    * `change` is one of `added` / `dropped` / `type_changed` /
    * `type_changed_incompatible`; `common_type` is the
    * [[SchemaUtils.widen]]ed comparison type a diff would use
    * (NULL for added/dropped, and for the incompatible case — which
    * is exactly the pair [[TableDiff.diff]] fails fast on, so this
    * report is where a user SEES that case without triggering it).
    * Unchanged columns are not listed; nullability-only differences
    * are not a type change (file-source reads force nullable).
    */
  def schemaDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    val b = before.schema
    val a = after.schema
    def typeOf(s: org.apache.spark.sql.types.StructType, n: String) =
      s.fields.find(_.name.equalsIgnoreCase(n)).map(_.dataType)
    val rows = SchemaUtils
      .mergeColumns(b.fieldNames.toSeq, a.fieldNames.toSeq)
      .flatMap { c =>
        (typeOf(b, c), typeOf(a, c)) match {
          case (Some(bt), Some(at))
              if !SchemaUtils.sameTypeIgnoringNullability(bt, at) =>
            val w = SchemaUtils.widen(bt, at)
            Some((c, bt.catalogString, at.catalogString,
              if (w.isDefined) "type_changed" else "type_changed_incompatible",
              w.map(_.catalogString).orNull))
          case (Some(bt), None) =>
            Some((c, bt.catalogString, null: String, "dropped", null: String))
          case (None, Some(at)) =>
            Some((c, null: String, at.catalogString, "added", null: String))
          case _ => None
        }
      }
    rows.toDF("column", "before_type", "after_type", "change", "common_type")
  }

  /** V6: status-code → human label decode for one status column
    * (samples/setup_all.sql:89-117). Pure `when` chain — codegen'd,
    * no UDF.
    */
  def decodeStatus(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.isNull, "PRESENT_BOTH")
      .when(c === TableDiff.Match, "MATCH")
      .when(c === TableDiff.Different, "DIFFERENT")
      .when(c === TableDiff.NullInBeforeOnly, "NULL_IN_BEFORE_ONLY")
      .when(c === TableDiff.NullInAfterOnly, "NULL_IN_AFTER_ONLY")
      .when(c === TableDiff.MissingInBefore, "MISSING_IN_BEFORE")
      .when(c === TableDiff.MissingInAfter, "MISSING_IN_AFTER")
      .otherwise("UNKNOWN")
}
