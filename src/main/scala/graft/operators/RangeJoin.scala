package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval). Spark plans a bare
  * `p.ts BETWEEN i.start AND i.end` join as BroadcastNestedLoopJoin —
  * O(points × intervals) and a non-starter at 100 TB. The scalable
  * shape: quantize time into fixed-width buckets, explode each
  * interval to the buckets it overlaps, equi-join on the bucket, then
  * refine with the exact predicate. Cost is linear in
  * |points| + Σ interval-spans/bucket-width, and the join is an
  * ordinary shuffle/broadcast hash join Catalyst can optimize.
  * Choose `bucketMicros` near the typical interval length: too small
  * explodes intervals into many buckets, too large degrades toward
  * all-pairs within a bucket.
  */
object RangeJoin {

  /** Inclusive-bounds point-in-interval join. Column names of
    * `points` and `intervals` must be disjoint.
    *
    * Set `broadcastIntervals` when the interval side is known-small
    * (top-k incident windows, a calendar table): it pins a broadcast
    * hash join so the points side is never shuffled, independent of
    * whatever size estimate Catalyst derives for the post-explode
    * frame — at high scale the stats on a windowed/limited subtree
    * are unknown and the planner would otherwise fall back to
    * shuffling both sides on `_bucket`.
    */
  def pointInInterval(
      points: DataFrame,
      pointTimeCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketMicros: Long = 600000000L /* 10 min */,
      broadcastIntervals: Boolean = false): DataFrame = {
    val pb = points.withColumn(
      "_bucket",
      expr(s"unix_micros(CAST($pointTimeCol AS TIMESTAMP)) DIV $bucketMicros"))
    val ib = intervals.withColumn(
      "_bucket",
      explode(expr(
        s"""sequence(unix_micros(CAST($startCol AS TIMESTAMP)) DIV $bucketMicros,
           |         unix_micros(CAST($endCol AS TIMESTAMP)) DIV $bucketMicros)""".stripMargin)))
    // a point lives in exactly one bucket and an interval is listed
    // once per bucket it spans → each (point, interval) pair meets at
    // most once; no dedup needed after the refine
    pb.join(if (broadcastIntervals) broadcast(ib) else ib, "_bucket")
      .filter(col(pointTimeCol) >= col(startCol) && col(pointTimeCol) <= col(endCol))
      .drop("_bucket")
  }
}
