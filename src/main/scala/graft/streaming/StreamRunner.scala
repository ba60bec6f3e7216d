package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runs a Structured-Streaming transform over the driver's events
  * parquet to completion, returning the final result as a plain
  * DataFrame — the bridge that makes streaming operators visible to
  * the batch-shaped correctness harness (graft.Verify hashes the
  * result against a DuckDB oracle like any other query).
  *
  * Mechanics: the file stream source requires a DIRECTORY, so the
  * single events.parquet is staged behind a symlink in a scratch dir;
  * the stream runs with Trigger.AvailableNow (process everything
  * currently present, then stop) into an in-memory sink in complete
  * output mode. Same code path as an unbounded run — micro-batch
  * planner, state store, event-time windows — just with a bounded
  * source, which is exactly the batch-equivalence claim being tested.
  */
object StreamRunner {

  private val sinkCounter = new AtomicInteger()

  /** Events table as a stream, with the same nanos→TIMESTAMP
    * normalization as [[graft.sources.Tables.events]] — except to
    * TimestampType (not NTZ): event-time watermarks require TIMESTAMP.
    * Run under a UTC session so the wall-clock values coincide.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Paths.get(dir, "events.parquet")
    // stage dir keyed by a SHA-256 digest of the full path: a strong
    // digest cannot collide two datasets onto one stage dir (a 32-bit
    // hash or lossy sanitization could) and keeps the dir name short
    // regardless of how deep the data path nests (a full embedded
    // path can blow the 255-byte filename limit). The link is
    // recreated every call so a stale or dangling symlink from a
    // prior run can never wedge the source (Files.exists FOLLOWS
    // links, so a dangling one reads as absent while
    // createSymbolicLink still throws FileAlreadyExists).
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(src.toAbsolutePath.toString.getBytes("UTF-8"))
      .take(12).map(b => f"$b%02x").mkString
    val stage = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_stream_stage_$digest")
    Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    Files.deleteIfExists(link)
    Files.createSymbolicLink(link, src.toAbsolutePath)
    val schema = spark.read.parquet(src.toString).schema
    spark.readStream
      .schema(schema)
      .parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Start `streamingDf` with AvailableNow into a fresh memory sink,
    * wait for it to drain, and return the sink's contents.
    *
    * `statePartitions` sizes the stateful-operator shuffle for THIS
    * query (pinned into the checkpoint at start, so it is a per-query
    * knob by construction): each state partition carries a state
    * store with per-batch commit I/O, so it should track expected
    * state volume, not the session's batch-shuffle width — a
    * bench-scale micro-batch wants single digits where a 100 TB
    * deployment would run hundreds. The session conf is restored
    * after start.
    */
  def runToCompletion(
      streamingDf: DataFrame,
      outputMode: String = "complete",
      statePartitions: Int = 8): DataFrame = {
    val spark = streamingDf.sparkSession
    // memory-sink tables live in driver memory until dropped and
    // clearCache() does NOT free them; keep at most the previous
    // result alive (its consumer — Verify's write / Bench's count —
    // has finished by the time the next stream starts)
    val id = sinkCounter.incrementAndGet()
    (1 until id - 1).foreach(i => spark.catalog.dropTempView(s"graft_stream_sink_$i"))
    val sink = s"graft_stream_sink_$id"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions)
    val q =
      try
        streamingDf.writeStream
          .format("memory")
          .queryName(sink)
          .outputMode(outputMode)
          .trigger(Trigger.AvailableNow())
          .start()
      finally spark.conf.set(key, prev)
    q.awaitTermination()
    spark.table(sink)
  }
}
