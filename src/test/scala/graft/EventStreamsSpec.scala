package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Drives the streaming operators through MemoryStream → memory sink,
  * the in-process stand-in for a Kafka→Structured-Streaming pipeline.
  */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed counts aggregate per tumbling hour with watermark") {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    val q = EventStreams
      .windowedCounts(ms.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      ms.addData(
        Event(1, ts(5), 10, "click", 1.0),
        Event(2, ts(20), 10, "click", 2.0),
        Event(3, ts(70), 11, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(rows == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(60), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("session windows close after the gap and emit on watermark advance") {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    val q = EventStreams
      .sessionWindows(ms.toDF(), watermark = "10 minutes", gap = "30 minutes")
      .writeStream.format("memory").queryName("sw")
      .outputMode("append").start()
    try {
      // user 10: events at :00 and :10 (one session), then :90 (new session)
      ms.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(10), 10, "click", 1.0),
        Event(3, ts(90), 10, "click", 1.0))
      q.processAllAvailable()
      // advance watermark far enough to close everything
      ms.addData(Event(4, ts(600), 99, "view", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sw").filter("user_id = 10").collect()
        .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events"))).toSet
      assert(sessions == Set((ts(0), 2L), (ts(90), 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    val q = EventStreams
      .dedupStream(ms.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(1, ts(0), 10, "click", 1.0), // duplicate in-batch
        Event(2, ts(1), 10, "view", 2.0))
      q.processAllAvailable()
      ms.addData(Event(1, ts(2), 10, "click", 1.0)) // replay across batches
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream diff flags events missing from the actual stream") {
    import spark.implicits._
    val expected = MemoryStream[Event](spark)
    val actual = MemoryStream[Event](spark)
    val q = EventStreams
      .missingInActual(expected.toDF(), actual.toDF())
      .writeStream.format("memory").queryName("missing")
      .outputMode("append").start()
    try {
      expected.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(1), 10, "view", 2.0),
        Event(3, ts(2), 11, "click", 3.0))
      actual.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(3, ts(2), 11, "click", 3.0)) // event 2 lost downstream
      q.processAllAvailable()
      // advance both watermarks far enough to expire the join state
      expected.addData(Event(99, ts(600), 1, "view", 0.0))
      actual.addData(Event(99, ts(600), 1, "view", 0.0))
      q.processAllAvailable()
      val missing = spark.table("missing").collect()
        .map(_.getAs[Long]("event_id")).toSeq.filter(_ != 99L)
      assert(missing == Seq(2L))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counters across batches") {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    val q = EventStreams
      .runningUserCounts(ms.toDS())
      .writeStream.format("memory").queryName("ruc")
      .outputMode(EventStreams.runningUserCountsOutputMode).start()
    try {
      ms.addData(Event(1, ts(0), 10, "click", 1.5), Event(2, ts(1), 10, "click", 2.5))
      q.processAllAvailable()
      ms.addData(Event(3, ts(2), 10, "view", 6.0))
      q.processAllAvailable()
      val last = spark.table("ruc").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .filter(_._1 == 10).maxBy(_._2)
      // state carried across the two batches: 3 events, 10.0 total
      assert(last == ((10L, 3L, 10.0)))
    } finally q.stop()
  }

  test("running counters expire on the event-time timeout and restart from zero") {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    val q = EventStreams
      .runningUserCounts(ms.toDS()) // default expiry: 1h past the user's newest event
      .writeStream.format("memory").queryName("ruc_expiry")
      .outputMode(EventStreams.runningUserCountsOutputMode).start()
    try {
      // b1: user 10 active; timeout registered at ts(1) + 1h
      ms.addData(Event(1, ts(0), 10, "click", 1.5), Event(2, ts(1), 10, "click", 2.5))
      q.processAllAvailable()
      // b2: unrelated user far in the future — advances the watermark
      // to ts(600) - 10min, well past user 10's timeout
      ms.addData(Event(3, ts(600), 99, "view", 0.0))
      q.processAllAvailable()
      // b3: another unrelated user — user 10 has NO data this batch, so
      // the timeout fires: final state (10, 2, 4.0) re-emitted, removed
      ms.addData(Event(4, ts(610), 11, "view", 0.0))
      q.processAllAvailable()
      // b4: user 10 returns — a fresh counter, not a continuation
      ms.addData(Event(5, ts(620), 10, "click", 7.0))
      q.processAllAvailable()
      val user10 = spark.table("ruc_expiry").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .filter(_._1 == 10)
      // restart proof: post-expiry row counts only the new event
      assert(user10.contains((10L, 1L, 7.0)), user10.mkString(", "))
      // no continuation: had state survived, b4 would emit (10, 3, 11.0)
      assert(!user10.exists(_._2 == 3L), user10.mkString(", "))
    } finally q.stop()
  }

  test("foldBatches + upsert merge equals sequential batch merges (streaming SCD2)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = "/root/testdata/sf0.001"
    val slices = 3
    val histSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("valid_from", DateType),
      StructField("valid_to", DateType),
      StructField("is_current", BooleanType),
      StructField("change_type", StringType)))
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), histSchema)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") === 1)
      .select("user_id", "value")
    def date(i: Long) = f"2030-01-0${i + 1}%d"
    // streaming fold through the real micro-batch engine
    val streamed = graft.streaming.StreamRunner.foldBatches(
      graft.streaming.StreamRunner.slicedEventsStream(spark, dir, slices),
      empty) { (h, batch, id) =>
      graft.operators.Scd2.merge(
        h, snap(batch), Seq("user_id"), date(id), deleteAbsentKeys = false)
    }
    // batch twin: identical slices merged sequentially, no stream
    val ev = graft.sources.Tables.events(spark, dir)
    val batched = (0 until slices).foldLeft(empty) { (h, i) =>
      graft.operators.Scd2.merge(
        h, snap(ev.filter(pmod(col("event_id"), lit(slices)) === i)),
        Seq("user_id"), date(i.toLong), deleteAbsentKeys = false)
    }
    assert(streamed.collect().toSet == batched.collect().toSet)
    // upsert semantics actually exercised: users absent from later
    // slices keep an OPEN row (no 'deleted' anywhere), and updates
    // closed earlier versions
    val types = streamed.collect().map(_.getAs[String]("change_type")).toSet
    assert(!types.contains("deleted"))
    assert(streamed.filter(col("valid_to").isNotNull).count() > 0)
  }

  test("streamed IVF append equals batch append (batch-split invariance)") {
    import org.apache.spark.sql.functions._
    import graft.operators.SimilaritySearch
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.embeddings(spark, dir)
    val base = SimilaritySearch.buildIndex(
      e.filter(col("vec_id") % 3 =!= 0), centroidMod = 50)
    val streamed = graft.streaming.StreamRunner.foldBatches(
      graft.streaming.StreamRunner.slicedStream(
        e.filter(col("vec_id") % 3 === 0), "vec_id", slices = 3,
        tag = s"$dir#emb_mod3_spec"),
      base.assignments) { (acc, batch, _) =>
      SimilaritySearch.appendToIndex(
        SimilaritySearch.IvfIndex(base.centroids, acc), batch).assignments
    }
    val batched = SimilaritySearch.appendToIndex(
      base, e.filter(col("vec_id") % 3 === 0)).assignments
    // the assignment TABLES agree row-for-row (modulo order), so any
    // probe over the streamed index is the batch answer by construction
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cand_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(streamed) == key(batched))
    assert(streamed.count() == e.count())
  }

  test("late-window watermark progression: the lag-2 engine characterization (retired from the oracle in r13)") {
    // This pins SPARK'S OWN late-input filter progression — an
    // engine-version characterization, not cross-engine semantics:
    // batch i's input is filtered with the MILLISECOND-floored max
    // event time through batch i-2 minus the delay (the watermark
    // REPORTED for batch i is already max(through i-1) - delay; the
    // input filter lags the report by one batch — pinned with
    // ProbeLateWindow). Until r13 the q_stream_late_window DuckDB
    // oracle replayed this model; it now lives HERE, so a future
    // Spark version changing the progression updates one spec
    // instead of reddening the cross-engine artifact — the oracle
    // keeps only the characterization-independent gates.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sent = Seq(
      (-1L, new Timestamp(maxTs.getTime + 4L * 86400 * 1000), -1L, "sentinel", 0.0, 4L),
      (-2L, new Timestamp(maxTs.getTime + 5L * 86400 * 1000), -1L, "sentinel", 0.0, 5L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "arrival")
    val arr = ev
      .withColumn("arrival", pmod(col("event_id"), lit(4)).cast("long"))
      .unionByName(sent)
      .localCheckpoint(true)
    val agg = graft.streaming.StreamRunner
      .slicedStream(arr, "arrival", 6, tag = s"$dir#latewindow-charspec")
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val streamed = graft.streaming.StreamRunner
      .runToCompletion(agg, outputMode = "append", statePartitions = 4)
      .filter(col("event_type") =!= "sentinel")

    // the replay: per-slice max event time (ms-floored via getTime),
    // filter value for slice s = max over slices <= s-2, minus 2 days
    val sliceMax = arr.groupBy("arrival").agg(max(col("ts")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val order = sliceMax.keys.toSeq.sorted
    val wmDf = order.map { s =>
      val prior = order.filter(_ <= s - 2).map(sliceMax)
      val f =
        if (prior.isEmpty) null
        else new Timestamp(prior.max - 2L * 86400 * 1000)
      (s, f)
    }.toDF("arrival", "wm_filter")
    val kept = arr.join(wmDf, "arrival")
      .filter(
        col("wm_filter").isNull ||
          expr("window(ts, '6 hours').end") > col("wm_filter"))
    val replayed = kept.filter(col("event_type") =!= "sentinel")
      .groupBy(
        expr("window(ts, '6 hours').start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val s = canon(streamed)
    assert(s.nonEmpty, "fixture must emit real windows")
    assert(s == canon(replayed),
      "Spark's late-input filter no longer matches the lag-2, ms-floored " +
        "characterization — re-probe with ProbeLateWindow and update THIS spec " +
        "(the cross-engine oracle is progression-independent by design)")
  }
}
