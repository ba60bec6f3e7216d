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

  /** State-store provider for the stateful bridges ([[runToCompletion]]).
    * Values: "hdfs" (engine default, memory-map + full-snapshot
    * upload per commit), "rocksdb" (in-box RocksDBStateStoreProvider —
    * disk-backed native store, state no longer bounded by executor
    * heap), "rocksdb-changelog" (RocksDB + changelog checkpointing:
    * per-commit upload is the DELTA, snapshots amortized in the
    * background — the production configuration for large state).
    *
    * Default "hdfs", from the round-10 A/B on the six stateful
    * q_stream_* queries at sf0.1 (BASELINE.md): totals 19.8 s (hdfs)
    * vs 22.7 s (rocksdb, 1.14×) vs 21.6 s (rocksdb-changelog, 1.09×)
    * — at bench state volume (≤ a few MB per store) the HDFS-backed
    * provider's in-heap map beats RocksDB's native-write
    * amortization, and changelog mode's deferred snapshots never pay
    * off in a run-to-completion stream. Round-11's StateScaleBench
    * pushed the A/B to 6.4M keys and found NO on-box wall-clock
    * crossover (hdfs 14.1 s vs changelog 26.1 s at 6.4M — the hdfs
    * provider commits per-batch deltas, snapshots in background
    * maintenance): the case for "rocksdb-changelog" is OPERATIONAL —
    * state beyond executor heap, and remote-checkpoint upload volume
    * (delta ∝ new keys vs snapshots ∝ accumulated state) — which is
    * exactly why the knob is an env (`SPARK_GRAFT_STATE_PROVIDER`)
    * and a per-call parameter, not a code fork.
    */
  val defaultStateProvider: String =
    sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")

  private val RocksDbProviderClass =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProvKey = "spark.sql.streaming.stateStore.providerClass"
  private val ClogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Pin the session's state-store provider and return the previous
    * (providerClass, changelogCheckpointing) values for
    * [[restoreStateProvider]]. Shared by [[runToCompletion]] and the
    * provider A/B benches so the knob semantics (explicit "hdfs"
    * UNSETS an inherited RocksDB pin, not merely leaves it) cannot
    * drift between them.
    */
  private[graft] def setStateProvider(
      spark: SparkSession, stateProvider: String): (Option[String], Option[String]) = {
    val prev = (spark.conf.getOption(ProvKey), spark.conf.getOption(ClogKey))
    stateProvider match {
      case "hdfs" =>
        spark.conf.unset(ProvKey)
        spark.conf.unset(ClogKey)
      case "rocksdb" =>
        spark.conf.set(ProvKey, RocksDbProviderClass)
        spark.conf.set(ClogKey, "false")
      case "rocksdb-changelog" =>
        spark.conf.set(ProvKey, RocksDbProviderClass)
        spark.conf.set(ClogKey, "true")
      case other =>
        throw new IllegalArgumentException(
          s"unknown stateProvider '$other' — expected hdfs | rocksdb | rocksdb-changelog")
    }
    prev
  }

  private[graft] def restoreStateProvider(
      spark: SparkSession, prev: (Option[String], Option[String])): Unit = {
    prev._1.fold(spark.conf.unset(ProvKey))(spark.conf.set(ProvKey, _))
    prev._2.fold(spark.conf.unset(ClogKey))(spark.conf.set(ClogKey, _))
  }

  // process-unique suffix for staged directories; stage dirs are small
  // (a symlink + sentinel files) so per-JVM copies are cheap
  private val jvmNonce: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "_")

  private val sinkCounter = new AtomicInteger()

  // staged dir + raw file schema per (data path, sentinel layout):
  // staging involves a full max(ts) scan (sentinel event times) plus
  // sentinel parquet writes, and a stream-stream query calls
  // eventsStream once PER SIDE — memoizing makes the second (and any
  // bench re-run's) call free. Safe to reuse within the JVM: contents
  // are deterministic for the key, and the dir is already per-JVM.
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, org.apache.spark.sql.types.StructType)]()

  /** Events table as a stream, with the same nanos→TIMESTAMP
    * normalization as [[graft.sources.Tables.events]] — except to
    * TimestampType (not NTZ): event-time watermarks require TIMESTAMP.
    * Run under a UTC session so the wall-clock values coincide.
    *
    * `sentinels` > 0 stages that many single-row "watermark pusher"
    * files after the real data (each with `event_id = -i`, an event
    * time i days past the real maximum) and reads with
    * `maxFilesPerTrigger = 2` so the data file and the first sentinel
    * share the first micro-batch while each later sentinel gets its
    * own. Operators that only EMIT when the watermark passes —
    * stream-stream outer joins, event-time state timeouts — never
    * flush in a single AvailableNow batch (the watermark only
    * advances at a batch's END); the first batch's sentinel advances
    * the watermark past all real rows and the remaining sentinel
    * batches give the engine batches in which to evict + emit. Callers filter the
    * sentinel rows (`event_id < 0`) out of the result. The file source
    * processes oldest-modification-time first, so the freshly written
    * sentinels always follow the (old) testdata link.
    */
  def eventsStream(spark: SparkSession, dir: String, sentinels: Int = 0): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Paths.get(dir, "events.parquet")
    // stage dir keyed by a SHA-256 digest of the full path (plus the
    // sentinel layout, which changes the dir contents): a strong
    // digest cannot collide two datasets onto one stage dir (a 32-bit
    // hash or lossy sanitization could) and keeps the dir name short
    // regardless of how deep the data path nests (a full embedded
    // path can blow the 255-byte filename limit). The link is
    // recreated every call so a stale or dangling symlink from a
    // prior run can never wedge the source (Files.exists FOLLOWS
    // links, so a dangling one reads as absent while
    // createSymbolicLink still throws FileAlreadyExists).
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${src.toAbsolutePath}#sentinels=$sentinels".getBytes("UTF-8"))
      .take(12).map(b => f"$b%02x").mkString
    // per-JVM stage (same defense as SparkEntry's scratch dirs): a
    // path keyed only by the data digest would let two concurrent
    // harness processes delete/recreate each other's symlink and
    // sentinels mid-stream
    val (stageDir, schema) = stageCache.computeIfAbsent(digest, { _ =>
      val stage = Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft_stream_stage_${digest}_$jvmNonce")
      Files.createDirectories(stage)
      val link = stage.resolve("events.parquet")
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, src.toAbsolutePath)
      val sch = spark.read.parquet(src.toString).schema
      if (sentinels > 0) stageSentinels(spark, src, stage, sch, sentinels)
      (stage.toString, sch)
    })
    // sentinel runs batch data + first sentinel TOGETHER (the
    // watermark still advances past all real rows at that batch's
    // end), leaving the remaining sentinels to drive the
    // evict-and-emit batches — fewer micro-batches than one-file-per
    // -trigger at identical output. One spare sentinel batch is the
    // minimum: state flushed by batch N's watermark emits in batch
    // N+1.
    val reader = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", if (sentinels > 0) "2" else "1000")
    reader
      .parquet(stageDir)
      .withColumn("ts", streamTs(schema))
  }

  /** Stream-side ts normalization across the two driver data layouts
    * (see `Tables.events`): BIGINT nanos under nanosAsLong, or native
    * TIMESTAMP_NTZ micros. Either way the stream carries TIMESTAMP
    * (micros, session TZ = UTC everywhere in the harness) — the type
    * the watermark/window machinery has been characterized against.
    */
  private def streamTs(schema: org.apache.spark.sql.types.StructType) =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts DIV 1000)")
      case _ => col("ts").cast("timestamp")
    }

  /** Events table as a CHANGE stream of `slices` chronologically
    * ordered micro-batches: slice i holds the rows with
    * `event_id % slices = i`, staged as one parquet file each with
    * strictly increasing modification times, and read with
    * `maxFilesPerTrigger = 1` so the file source delivers exactly one
    * slice per micro-batch, in slice order. This is the CDC-ingest
    * harness shape (each batch a partial key set to fold into state —
    * see q_stream_scd2); no watermark machinery is involved, so the
    * normalized NTZ timestamps are staged as-is.
    */
  def slicedEventsStream(spark: SparkSession, dir: String, slices: Int): DataFrame =
    slicedStream(
      graft.sources.Tables.events(spark, dir), "event_id", slices,
      tag = s"${Paths.get(dir).toAbsolutePath}#events")

  /** Generalization of [[slicedEventsStream]] to any keyed DataFrame:
    * slice i holds the rows with `pmod(keyCol, slices) = i`, staged as
    * one parquet file each with strictly increasing modification times
    * and delivered one slice per micro-batch. `tag` must identify the
    * DATASET (it keys the per-JVM stage cache — the upstream plan is
    * evaluated once per distinct (tag, keyCol, slices)). This is the
    * ingest harness for non-event streams: embedding batches folding
    * into an ANN index, document batches folding into dedup
    * signatures.
    */
  def slicedStream(df: DataFrame, keyCol: String, slices: Int, tag: String): DataFrame = {
    require(slices >= 1, "need at least one slice")
    val spark = df.sparkSession
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$tag#key=$keyCol#slices=$slices".getBytes("UTF-8"))
      .take(12).map(b => f"$b%02x").mkString
    val (stageDir, schema) = stageCache.computeIfAbsent(digest, { _ =>
      val stage = Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft_stream_slices_${digest}_$jvmNonce")
      Files.createDirectories(stage)
      import scala.jdk.CollectionConverters._
      // ONE scan stages every slice (r20, guide §1.2): the old
      // per-slice `filter(pmod = i).coalesce(1)` loop re-evaluated the
      // whole upstream plan `slices` times — one full corpus scan per
      // slice. Persisting the frame for the staging block keeps the
      // loop's exact write contract (one coalesced file per slice,
      // upstream row order, no shuffle — a partitionBy write was
      // measured to add a staged-bytes exchange, tripping the bench's
      // shuffle gate for zero benefit) while every slice after the
      // first filters the CACHED scan instead of re-running the plan.
      val staged = df.persist()
      try {
        (0 until slices).foreach { i =>
          val tmp = Files.createTempDirectory("graft_slice_")
          staged.filter(org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.col(keyCol),
              org.apache.spark.sql.functions.lit(slices)) === i)
            // harness-only coalesce: each slice must be exactly ONE
            // parquet file so the file stream source replays it as one
            // ordered unit — never a production write pattern
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val listing = Files.list(tmp)
          val part =
            try listing.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"slice write produced no parquet in $tmp"))
            finally listing.close()
          val dest = stage.resolve(f"slice_$i%03d.parquet")
          Files.deleteIfExists(dest)
          Files.copy(part, dest)
          // mtime IS the file source's processing order — pin it to the
          // slice index explicitly instead of trusting write latency
          Files.setLastModifiedTime(
            dest, java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
          graft.TmpfsScratch.deleteRecursively(tmp)
        }
      } finally staged.unpersist()
      (stage.toString, df.schema)
    })
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
  }

  /** Fold a streaming DataFrame's micro-batches into an accumulator
    * via foreachBatch — the incremental-ingest bridge (CDC → SCD2
    * history, incremental dedup signatures, index appends). `step`
    * receives (accumulator, batch, batchId); its result is eagerly
    * localCheckpoint'ed, which both materializes the batch data
    * (a foreachBatch frame is only valid inside its batch) and cuts
    * the per-batch lineage growth that would otherwise compound over
    * the run (the ConnectedComponents hazard).
    */
  def foldBatches(
      streamingDf: DataFrame,
      zero: DataFrame,
      statePartitions: Int = 8)(
      step: (DataFrame, DataFrame, Long) => DataFrame): DataFrame = {
    val spark = streamingDf.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions)
    val ck = graft.TmpfsScratch.createTempDir("graft_stream_fold_ck_")
    @volatile var acc = zero
    try {
      // The conf must stay overridden until awaitTermination returns:
      // micro-batches plan asynchronously, so restoring right after
      // start() would race batch planning and leave most steps on the
      // session default.
      val q = streamingDf.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          acc = step(acc, batch, id).localCheckpoint(true)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      acc
    } finally {
      spark.conf.set(key, prev)
      graft.TmpfsScratch.deleteRecursively(ck)
    }
  }

  /** Write `n` one-row sentinel parquet files into `stage`. Row i
    * carries `event_id = -i` and `ts = max(real ts) + i days` in the
    * RAW file schema's own ts form (BIGINT nanos under nanosAsLong,
    * or native NTZ micros — the stream-side normalization applies
    * downstream). Files are written fresh every call so their
    * modification time — the file source's processing order — is
    * always newer than the linked testdata.
    */
  private def stageSentinels(
      spark: SparkSession,
      src: java.nio.file.Path,
      stage: java.nio.file.Path,
      schema: org.apache.spark.sql.types.StructType,
      n: Int): Unit = {
    import scala.jdk.CollectionConverters._
    // sentinel ts = max(real ts) + i days, in whichever raw form this
    // data generation stores ts (BIGINT nanos or native NTZ micros) —
    // the stream-side normalization converts both identically
    val maxRow = spark.read.parquet(src.toString).agg(max(col("ts"))).head()
    val dayNanos = 86400L * 1000 * 1000 * 1000
    val tsFor: Int => AnyRef = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val maxTs = maxRow.getLong(0)
        i => java.lang.Long.valueOf(maxTs + i * dayNanos)
      case _ =>
        val maxTs = maxRow.getAs[java.time.LocalDateTime](0)
        i => maxTs.plusDays(i.toLong)
    }
    (1 to n).foreach { i =>
      val values = schema.fields.map { f =>
        (f.name, f.dataType.typeName) match {
          case ("event_id", _)   => java.lang.Long.valueOf(-i.toLong)
          case ("ts", _)         => tsFor(i)
          case ("user_id", _)    => java.lang.Long.valueOf(-1L)
          case ("event_type", _) => "sentinel"
          case ("value", _)      => java.lang.Double.valueOf(0.0)
          case _                 => null
        }
      }
      val row = org.apache.spark.sql.Row.fromSeq(values.toSeq)
      val tmp = Files.createTempDirectory("graft_sentinel_")
      spark.createDataFrame(List(row).asJava, schema)
        // harness-only coalesce: one-row sentinel must land as one
        // file so its mtime defines the stream's processing order
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"sentinel write produced no parquet in $tmp"))
        finally listing.close() // directory handle leaks otherwise
      val dest = stage.resolve(s"sentinel_$i.parquet")
      Files.deleteIfExists(dest)
      Files.copy(part, dest)
      // fresh mtime AFTER the copy so ordering holds even if copy
      // preserved the source attribute on some filesystem
      Files.setLastModifiedTime(
        dest, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      graft.TmpfsScratch.deleteRecursively(tmp)
    }
  }

  /** Start `streamingDf` with AvailableNow into a fresh memory sink,
    * wait for it to drain, and return the sink's contents.
    *
    * `statePartitions` sizes the stateful-operator shuffle for THIS
    * query (pinned into the checkpoint at start, so it is a per-query
    * knob by construction): each state partition carries a state
    * store with per-batch commit I/O, so it should track expected
    * STATE volume — a stream-stream join holding both full inputs
    * wants single digits at bench scale (q_stream_missing passes 4)
    * where a 100 TB deployment would run hundreds. The default (≤ 0)
    * inherits the session's shuffle width untouched: measured on the
    * window/session/dedup family, the session's 32 beat a forced 8 by
    * ~1.4× (more stores = more commit parallelism when state is
    * small), so only state-heavy queries should dial this down. When
    * set, the override stays active until awaitTermination returns —
    * micro-batches plan asynchronously, so restoring right after
    * start() would race batch planning (the foldBatches rule).
    */
  def runToCompletion(
      streamingDf: DataFrame,
      outputMode: String = "complete",
      statePartitions: Int = 0,
      stateProvider: String = defaultStateProvider): DataFrame = {
    val spark = streamingDf.sparkSession
    // provider is pinned into the checkpoint at start, so setting it
    // per-query is safe (each bridge run creates a fresh checkpoint);
    // like the shuffle-width override it must stay set until
    // awaitTermination returns — micro-batches plan asynchronously
    val prevProvider = setStateProvider(spark, stateProvider)
    // memory-sink tables live in driver memory until dropped and
    // clearCache() does NOT free them; keep at most the previous
    // result alive (its consumer — Verify's write / Bench's count —
    // has finished by the time the next stream starts)
    val id = sinkCounter.incrementAndGet()
    (1 until id - 1).foreach(i => spark.catalog.dropTempView(s"graft_stream_sink_$i"))
    val sink = s"graft_stream_sink_$id"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    if (statePartitions > 0) spark.conf.set(key, statePartitions)
    // checkpoint on tmpfs when available: every micro-batch fsyncs
    // offset/commit logs plus one state delta per store per
    // partition, and for these run-to-completion bridges the
    // checkpoint is throwaway (the result is read out of the memory
    // sink before the dir is deleted) — paying disk fsync latency per
    // commit buys nothing. A real deployment points this at durable
    // storage; that knob is writeStream's, not the operator's.
    val ck = graft.TmpfsScratch.createTempDir("graft_stream_ck_")
    try {
      // same rule as foldBatches: micro-batches plan asynchronously,
      // so the conf override must survive until awaitTermination
      // returns — restoring right after start() races batch planning
      val q = streamingDf.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode(outputMode)
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink)
    } finally {
      spark.conf.set(key, prev)
      restoreStateProvider(spark, prevProvider)
      // tmpfs is RAM — leaking checkpoints would eat memory, not disk
      graft.TmpfsScratch.deleteRecursively(ck)
    }
  }
}
