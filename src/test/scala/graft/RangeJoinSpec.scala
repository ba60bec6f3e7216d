package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  test("bucketized point-in-interval join ≡ naive BETWEEN join") {
    import spark.implicits._
    val points = (0 until 200)
      .map(i => (i.toLong, ts(i)))
      .toDF("event_id", "ts")
    val intervals = Seq(
      (1L, ts(5), ts(12)),    // shorter than one bucket
      (2L, ts(10), ts(95)),   // spans many buckets; overlaps interval 1
      (3L, ts(150), ts(150)), // zero-length (single instant)
      (4L, ts(300), ts(310))  // no points inside
    ).toDF("window_id", "w_start", "w_end")
    val fast = RangeJoin
      .pointInInterval(points, "ts", intervals, "w_start", "w_end",
        bucketMicros = 600L * 1000000) // 10-min buckets
      .select("event_id", "window_id")
    val naive = points
      .join(intervals, $"ts" >= $"w_start" && $"ts" <= $"w_end")
      .select("event_id", "window_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // sanity: overlapping intervals both match, zero-length matches its instant
    val m = fast.collect().groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(m(1L) == 8 && m(2L) == 86 && m(3L) == 1 && !m.contains(4L))
  }
}
