package graft

import org.apache.spark.sql.functions._

/** Throwaway probe: print per-batch watermark + input rows for the
  * late-window stream so the oracle's watermark replay can be pinned
  * to the engine's actual progression. Run via
  * `Test/runMain graft.ProbeLateWindow`.
  */
object ProbeLateWindow {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sent = Seq(
      (-1L, new java.sql.Timestamp(maxTs.getTime + 4L * 86400 * 1000), -1L, "sentinel", 0.0, 4L),
      (-2L, new java.sql.Timestamp(maxTs.getTime + 5L * 86400 * 1000), -1L, "sentinel", 0.0, 5L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "arrival")
    val arr = ev
      .withColumn("arrival", pmod(col("event_id"), lit(4)).cast("long"))
      .unionByName(sent)
    val stream = graft.streaming.StreamRunner.slicedStream(
      arr, "arrival", 6,
      tag = s"/root/testdata/sf0.01#latewindow-probe")
    val agg = stream
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val ck = java.nio.file.Files.createTempDirectory("probe_late_ck_")
    val q = agg.writeStream
      .format("memory").queryName("probe_late_sink").outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    spark.stop()
  }
}
