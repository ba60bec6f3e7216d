package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

class RangeJoinRewriteSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; RangeJoinRewrite.install(s); s }

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  private def points: DataFrame = {
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, ts(i))).toDF("pid", "pts")
  }
  private def intervals: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts(10), ts(45)),   // spans several 10-min buckets
      (2L, ts(40), ts(41)),   // inside one bucket, overlaps interval 1
      (3L, ts(300), ts(480)), // long interval
      (4L, ts(490), ts(490))  // single instant
    ).toDF("iid", "lo", "hi")
  }

  private def naive: DataFrame =
    points.join(intervals, col("pts") >= col("lo") && col("pts") <= col("hi"))

  test("naive BETWEEN join is rewritten to a bucketized equi-join — no nested loop") {
    val p = naive.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("_rj_bucket"), p.take(1500)) // our synthetic key is the join key
  }

  test("rewritten join returns exactly the naive rows") {
    // expected set computed without the rule, on a plain cross filter
    val expected = points.collect().flatMap { pr =>
      intervals.collect().collect {
        case ir if !pr.getTimestamp(1).before(ir.getTimestamp(1)) &&
          !pr.getTimestamp(1).after(ir.getTimestamp(2)) =>
          (pr.getLong(0), ir.getLong(0))
      }
    }.toSet
    val got = naive.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // no duplicate (point, interval) pairs from the bucket explode
    assert(naive.count() == got.size)
  }

  test("inverted and NULL intervals drop out instead of crashing sequence()") {
    import spark.implicits._
    val pts = Seq((1L, ts(30))).toDF("pid", "pts")
    val bad = Seq(
      (1L, Some(ts(400)), Some(ts(10))), // inverted: lo > hi
      (2L, None, Some(ts(400))),         // NULL lo
      (3L, Some(ts(10)), Some(ts(60)))   // sane: matches the point
    ).toDF("iid", "lo", "hi")
    val j = pts.join(bad, col("pts") >= col("lo") && col("pts") <= col("hi"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("_rj_bucket"), p.take(1500)) // rule did fire
    val rows = j.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 3L)))
  }

  test("joins with an equi key are left alone") {
    import spark.implicits._
    val a = Seq((1L, ts(5))).toDF("k", "ats")
    val b = Seq((1L, ts(1), ts(9))).toDF("k", "blo", "bhi")
    val j = a.join(b, a("k") === b("k") && col("ats") >= col("blo") && col("ats") <= col("bhi"))
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("_rj_bucket"), p.take(1500))
    assert(j.count() == 1)
  }

  test("the GraftExtensions entry point injects without error") {
    // spark.sql.extensions only applies at session build (the
    // injected-rule list is sql-private); pin that the entry point
    // accepts the injection — rule behavior itself is covered above
    // through the install() path, which registers the same object
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(e)
  }
}
