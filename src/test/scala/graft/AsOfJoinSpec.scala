package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("lastPrior carries the latest right row at-or-before each left row per key") {
    import spark.implicits._
    val trades = Seq(
      (101L, ts(5), 1L, 9.0),   // after quote@1 → asof quote 1
      (102L, ts(10), 1L, 9.5),  // simultaneous with quote@10 → that quote
      (103L, ts(2), 2L, 7.0),   // user 2 has no prior quote → NULL
      (104L, ts(20), 2L, 7.5)   // after quote@15 → quote 4
    ).toDF("event_id", "ts", "user_id", "value")
    val quotes = Seq(
      (1L, ts(1), 1L, 100.0),
      (2L, ts(10), 1L, 110.0),
      (3L, ts(11), 1L, 120.0), // later than both trades of user 1
      (4L, ts(15), 2L, 200.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val r = AsOfJoin.lastPrior(
      trades, quotes, Seq("user_id"), "ts",
      payloadCols = Seq("event_id", "value"), tieCol = "event_id")
      .collect().map(x => x.getAs[Long]("event_id") ->
        (x.getAs[Any]("asof_event_id"), x.getAs[Any]("asof_value"))).toMap
    assert(r(101L) == ((1L, 100.0)))
    assert(r(102L) == ((2L, 110.0))) // tie: right row at equal ts is visible
    assert(r(103L) == ((null, null))) // no prior right row
    assert(r(104L) == ((4L, 200.0)))
  }

  test("a genuinely-NULL right payload is carried as NULL, not the previous non-NULL value") {
    import spark.implicits._
    val trades = Seq(
      (201L, ts(5), 1L),  // after quote@1 (price 100) → 100
      (202L, ts(12), 1L), // after quote@10 whose price is NULL → NULL, not 100
      (203L, ts(20), 1L)  // after quote@15 (price 120) → 120
    ).toDF("event_id", "ts", "user_id")
    val quotes = Seq(
      (1L, ts(1), 1L, Some(100.0)),
      (2L, ts(10), 1L, None), // the NULL observation that must not be skipped
      (3L, ts(15), 1L, Some(120.0))
    ).toDF("event_id", "ts", "user_id", "price")
    val r = AsOfJoin.lastPrior(
      trades, quotes, Seq("user_id"), "ts",
      payloadCols = Seq("event_id", "price"), tieCol = "event_id")
      .collect().map(x => x.getAs[Long]("event_id") ->
        (x.getAs[Any]("asof_event_id"), x.getAs[Any]("asof_price"))).toMap
    assert(r(201L) == ((1L, 100.0)))
    assert(r(202L) == ((2L, null))) // latest right ROW wins; its NULL is the answer
    assert(r(203L) == ((3L, 120.0)))
  }
}
