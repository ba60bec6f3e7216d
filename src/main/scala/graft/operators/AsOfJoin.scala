package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row at or
  * before the left row's timestamp, within matching partition keys —
  * the standard "last observation carried forward" temporal join
  * (market-data quotes→trades, attribution click→purchase).
  *
  * Composed entirely from built-ins (union + running
  * `last(_, ignoreNulls)` window) rather than a custom physical
  * operator: the union shuffles ONCE on the partition keys and each
  * partition is processed in time order — the same single-shuffle
  * cost a dedicated as-of SparkPlan would pay, with AQE/codegen kept.
  * A range-join formulation (`l.ts BETWEEN r.ts AND r.ts + tol`)
  * would be O(matches) larger; the window form is linear.
  */
object AsOfJoin {

  /** For every row of `left`, the latest `right` row with
    * `right.timeCol <= left.timeCol` and equal `partitionCols`.
    * Right-side payload columns come back as `asof_<name>` (NULL when
    * no prior right row exists). Ties at equal timestamps prefer the
    * right row (it is "already visible"), then break by `tieCol`.
    *
    * A right row whose payload value is genuinely NULL yields
    * `asof_<name> = NULL` — the payload rides inside a per-row
    * non-null struct, so the running `last(_, ignoreNulls)` tracks
    * the latest right ROW rather than the latest non-null VALUE and
    * never carries a stale earlier payload across a NULL observation.
    */
  def lastPrior(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag and align the two sides on a common schema: left keeps its
    // columns, right contributes only the as-of payload
    val lTagged = left
      .withColumn("_is_left", lit(1))
      .select(
        (partitionCols.map(col) :+ col(timeCol) :+ col(tieCol) :+ col("_is_left")) ++
          leftCols.filterNot(c => partitionCols.contains(c) || c == timeCol || c == tieCol)
            .map(col) ++
          payloadCols.map(c =>
            lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("v", right.schema(c).dataType))))
              .as(s"_r_$c")): _*)
    val rTagged = right
      .withColumn("_is_left", lit(0))
      .select(
        (partitionCols.map(col) :+ col(timeCol) :+ col(tieCol) :+ col("_is_left")) ++
          leftCols.filterNot(c => partitionCols.contains(c) || c == timeCol || c == tieCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(c => struct(col(c).as("v")).as(s"_r_$c")): _*)
    val byTime = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(timeCol), col("_is_left"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(byTime))
    }
    carried
      .filter(col("_is_left") === 1)
      .select(
        leftCols.map(col) ++
          payloadCols.map(c => col(s"asof_$c").getField("v").as(s"asof_$c")): _*)
  }
}
