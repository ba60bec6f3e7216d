package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's structural metric — the executed-plan shuffle-
  * exchange count — against live AQE plans. The walk must see through
  * ShuffleQueryStageExec leaves (whose inner plan is NOT a child, so
  * a naive collect() misses every nested stage), must not count
  * broadcast exchanges (they are not shuffles), and must not count
  * reused exchanges (reuse is the optimization the regression gate
  * should reward). If this metric drifts, the exchange-regression
  * gate built on it flags phantom regressions or misses real ones.
  */
class BenchMetricsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def executedExchanges(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    Bench.countExchanges(df.queryExecution.executedPlan)
  }

  test("a groupBy aggregation counts exactly its one shuffle") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    assert(executedExchanges(df) == 1)
  }

  test("a broadcast join adds zero shuffle exchanges") {
    import spark.implicits._
    val big = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b")).toDF("k", "name")
    val joined = big.join(broadcast(small), Seq("k"))
    assert(executedExchanges(joined) == 0)
  }

  test("a forced shuffle join counts both sides' exchanges") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = (1L to 1000L).map(i => (i % 13, i)).toDF("k", "va")
      val b = (1L to 500L).map(i => (i % 13, i)).toDF("k", "vb")
      val joined = a.join(b.hint("shuffle_hash"), Seq("k"))
      assert(executedExchanges(joined) == 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a self-join on the same aggregate reuses the exchange, counted once") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = (1L to 1000L).map(i => (i % 13, i)).toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s"))
      // both sides shuffle identically; AQE replaces one with a reused
      // exchange. Counted: agg shuffle (once) + the join's two
      // re-partitionings of the (tiny) agg outputs... the join of two
      // pre-partitioned aggregates needs NO extra exchange, so the
      // total is the agg's shuffle counted once, not twice.
      val joined = agg.join(
        agg.withColumnRenamed("s", "s2"), Seq("k"))
      val n = executedExchanges(joined)
      assert(n >= 1 && n <= 2, s"reused exchange must not double-count, got $n")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shuffle-bytes regression predicate: ratio AND absolute floor, never on failures") {
    val MiB = 1L << 20
    // real regression: 3× blown AND >1 MiB moved
    assert(Bench.shuffleBytesRegressed(now = 10 * MiB, prev = 2 * MiB))
    // kilobyte-scale exchange jitter is NOT a regression even at 3×+
    assert(!Bench.shuffleBytesRegressed(now = 400, prev = 118))
    // large absolute growth under 3× is the wall/exchange gates' job
    assert(!Bench.shuffleBytesRegressed(now = 5 * MiB, prev = 2 * MiB))
    // boundary: exactly 3× does not flag; just past both bounds does
    assert(!Bench.shuffleBytesRegressed(now = 6 * MiB, prev = 2 * MiB))
    assert(Bench.shuffleBytesRegressed(now = 6 * MiB + MiB + 1, prev = 2 * MiB))
    // a query with no measurement (failed run, missing listener
    // window) reads -1 and must never flag in either position
    assert(!Bench.shuffleBytesRegressed(now = -1, prev = 2 * MiB))
    assert(!Bench.shuffleBytesRegressed(now = 10 * MiB, prev = -1))
    // zero-shuffle previous round: any new shuffle over the floor flags
    assert(Bench.shuffleBytesRegressed(now = 2 * MiB, prev = 0))
    assert(!Bench.shuffleBytesRegressed(now = MiB / 2, prev = 0))
  }
}
