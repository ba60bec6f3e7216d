package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable column-profile sketches — the 100 TB upgrade of
  * [[DiffSummary.profile]]'s approx mode. `profile(approx = true)`
  * answers "how many distinct NOW" in one pass but its output is a
  * dead end: comparing last week's profile to this week's means
  * re-scanning last week's data. A SKETCH column (DataSketches
  * HyperLogLog via Spark's `hll_sketch_agg`) is a mergeable state:
  * persist one small sketch row per column per run, then diff,
  * union, or roll up profiles across runs/partitions/days without
  * touching the source data again — `hll_union_agg` over sketches of
  * disjoint slices yields the identical register state (HLL's merge
  * is lossless max-per-bucket), so estimate-after-merge equals
  * estimate-of-whole.
  *
  * Long form (one row per column) rather than one wide row: merging
  * and drift become ordinary groupBy/join on `col_name`, and a
  * 3,000-column table profiles into 3,000 skinny rows instead of a
  * row hitting codegen width limits (same reasoning as
  * DiffOptions.statusesAsMap).
  */
object ProfileSketch {

  /** One pass over `df` → one row per column:
    * (col_name, sketch BINARY, n_nulls, n_rows). Values ride into the
    * sketch as strings: hll_sketch_agg accepts int/long/string/binary
    * only, and the string form extends it to dates, timestamps, and
    * floats with distinctness preserved (Spark's string rendering is
    * injective on those types). NULLs are excluded by the sketch and
    * counted separately, matching COUNT(DISTINCT) semantics.
    *
    * @param lgK sketch precision (2^lgK buckets); 14 → ~0.8% relative
    *   standard error at a few KB per column
    */
  def columnSketches(df: DataFrame, lgK: Int = 14): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        hll_sketch_agg(col(c).cast("string"), lit(lgK)).as(s"${c}__sk"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `${c}__sk`, `${c}__nn`").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, sketch, n_nulls)",
      "__n AS n_rows")
  }

  /** Union two (or more, pre-unioned) sketch frames into one — the
    * no-rescan roll-up. Row counts and null counts are additive;
    * sketches merge via hll_union_agg.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("col_name")
      .agg(
        hll_union_agg(col("sketch")).as("sketch"),
        sum("n_nulls").as("n_nulls"),
        sum("n_rows").as("n_rows"))

  /** Decode a sketch frame into per-column estimates
    * (`est_distinct` is LONG — hll_sketch_estimate rounds).
    */
  def estimates(sketches: DataFrame): DataFrame =
    sketches.select(
      col("col_name"),
      hll_sketch_estimate(col("sketch")).as("est_distinct"),
      col("n_nulls"),
      col("n_rows"))

  /** Drift between two profile runs, computed purely from their
    * sketch frames — neither source is re-scanned.
    */
  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = estimates(before).select(
      col("col_name"),
      col("est_distinct").as("b_est_distinct"),
      col("n_nulls").as("b_n_nulls"),
      col("n_rows").as("b_n_rows"))
    val a = estimates(after).select(
      col("col_name"),
      col("est_distinct").as("a_est_distinct"),
      col("n_nulls").as("a_n_nulls"),
      col("n_rows").as("a_n_rows"))
    b.join(a, Seq("col_name"), "full_outer")
  }

  /** Relative-error guard used by the oracled cross-check: |est −
    * exact| / max(exact, 1) ≤ tol.
    */
  def withinTolerance(est: Column, exact: Column, tol: Double): Column =
    abs(est - exact) / greatest(exact.cast("double"), lit(1.0)) <= tol
}
