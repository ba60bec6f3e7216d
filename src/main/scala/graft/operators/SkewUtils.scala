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

  /** Two-stage salted sum+count per key. The salt is a deterministic
    * hash of the row's value column — any distribution works because
    * the second stage merges all salts of a key.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      salts: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", pmod(xxhash64(valueCol), lit(salts)))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcount"))
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcount")).as("n_rows"))
  }
}
