package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. Spark's AQE splits skewed *partitions*,
  * but a single hot KEY inside one reducer can't be split by the
  * planner — the classic fix is salting: spread each key over
  * `salts` sub-keys, pre-aggregate, then merge the partials. The
  * result is exactly the direct aggregation (the DuckDB oracle for
  * q_salted_agg IS the plain GROUP BY); only the shuffle layout
  * changes. Partials must be algebraic (sum/count/min/max — not
  * medians) for the merge to be exact.
  */
object SkewUtils {

  /** Two-stage salted sum+count per key. The salt derives from the
    * row's position (`monotonically_increasing_id`), NOT from the
    * data: hashing a value column would collapse a hot key whose
    * values are constant (the canonical skew case — billions of
    * default/sentinel values under one key) back onto one salt. Any
    * assignment works because the second stage merges every salt of a
    * key, so the nondeterminism of row ids across retries never
    * reaches the result.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      salts: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcount"))
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcount")).as("n_rows"))
  }
}
