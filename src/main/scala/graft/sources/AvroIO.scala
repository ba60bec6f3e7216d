package graft.sources

import java.net.URI
import java.nio.ByteBuffer
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.{SparkContext, TaskContext}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file sink/source built directly on the bundled Avro
  * core library (avro-1.12.1 ships in Spark's jars; the separate
  * `spark-avro` datasource module does not), completing the sink
  * family parquet/ORC/JSON/CSV with the common row-oriented exchange
  * format. Spark-side shape: the WRITE is one narrow
  * `mapPartitions`-style pass (each task streams its partition into
  * one container file through the Hadoop FileSystem API — works on
  * any Hadoop-addressable storage, no driver materialization), the
  * READ parallelizes one task per container file and rebuilds a
  * DataFrame under the original Catalyst schema. File-per-partition
  * is exactly how the datasource module lays Avro out, so the
  * operator's scale shape matches: tasks ↔ files, no shuffle in
  * either direction.
  *
  * The interesting edge is timestamp fidelity, handled via Avro
  * LOGICAL TYPES exactly as the Avro spec assigns them:
  * `TimestampType` (instant semantics) ↔ `timestamp-micros`,
  * `TimestampNTZType` (wall-clock, no zone — what the testdata
  * carries) ↔ `local-timestamp-micros`, `DateType` ↔ `date`. A reader
  * in any Avro-speaking system sees the same annotated longs/ints the
  * spec mandates; the round trip back through [[read]] restores the
  * exact Catalyst types (spec + q_sink_avro_roundtrip pin it).
  *
  * Durability: [[write]] uses a rename-based commit protocol. All
  * task output lands in a job-unique staging directory next to the
  * target; each task streams into an attempt-suffixed temp file and
  * renames it to its final `part-NNNNN.avro` name only after a clean
  * close (first committed attempt wins, later attempts discard), and
  * the target directory is touched only by the final staging→target
  * rename after every task has committed. A mid-write failure —
  * task crash, retried attempt, or whole-job abort — therefore never
  * makes a partial container file visible under the target path
  * (AvroIOSpec pins this with an injected mid-write task failure).
  */
object AvroIO {

  /** One Hadoop-conf broadcast per (SparkContext, conf contents),
    * reused by every [[write]]/[[read]] — a fresh broadcast per call
    * would accumulate driver/executor broadcast blocks over a
    * long-lived session, and [[read]]'s lazy DataFrame keeps
    * referencing its broadcast long after the call returns, so
    * per-call destroy() is not an option. The cache key includes the
    * SNAPSHOT of the conf entries (the map is cheap to build —
    * hundreds of entries): `hadoopConfiguration.set(...)` after the
    * first call (fresh object-store credentials, say) produces a new
    * broadcast instead of silently shipping the stale one; superseded
    * broadcasts are dropped to Spark's ContextCleaner, which reclaims
    * them once no lazy frame references them.
    */
  @volatile private var cachedConf: (SparkContext, Map[String, String], Broadcast[Map[String, String]]) = null
  private def confBroadcast(spark: SparkSession): Broadcast[Map[String, String]] = {
    val sc = spark.sparkContext
    // snapshot OUTSIDE the lock, via the copy constructor: it clones
    // the backing Properties under the source conf's monitor, so a
    // concurrent hadoopConfiguration.set(...) — the credential-refresh
    // scenario this cache exists for — cannot make the entry iteration
    // throw ConcurrentModificationException, which iterating the live
    // conf's fail-fast iterator could. Also keeps the object-wide lock
    // to a map compare, not a conf walk, so writers don't serialize.
    val snap = new Configuration(sc.hadoopConfiguration)
    val confMap = snap.asScala.map(e => e.getKey -> e.getValue).toMap
    synchronized {
      if (cachedConf == null || (cachedConf._1 ne sc) || cachedConf._2 != confMap)
        cachedConf = (sc, confMap, sc.broadcast(confMap))
      cachedConf._3
    }
  }

  /** Catalyst → Avro schema for the supported surface: the scalar
    * types plus ARRAY of them (the embedding-column shape). Every
    * nullable field (and nullable array element) is emitted as
    * `union(null, T)`, matching how the datasource module maps Spark
    * nullability.
    */
  def toAvroSchema(schema: StructType, recordName: String = "graft_record"): Schema = {
    def avroOf(dt: DataType, where: String): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case StringType => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case ArrayType(elem, containsNull) =>
        // ARRAY<scalar> — the embedding-column shape. Element
        // nullability maps to a [null, T] element union, same rule as
        // fields.
        val e = avroOf(elem, where + " element")
        Schema.createArray(
          if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
      case other =>
        throw new IllegalArgumentException(
          s"AvroIO does not map Catalyst type $other ($where)")
    }
    val fields = schema.fields.map { f =>
      val base = avroOf(f.dataType, s"column '${f.name}'")
      val t = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(
        f.name, t, null,
        if (f.nullable) org.apache.avro.JsonProperties.NULL_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def micosOf(epochSecond: Long, nano: Int): Long =
    Math.addExact(Math.multiplyExact(epochSecond, 1000000L), (nano / 1000).toLong)

  /** Row cell → Avro value. Timestamp cells arrive as java.sql or
    * java.time objects depending on the session's java8API setting —
    * both are handled, both land on the spec'd micros longs.
    */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    // short/byte map to Avro INT in the schema; the VALUE must be an
    // Integer too — Avro's union resolution (GenericData.isInteger)
    // recognizes only java.lang.Integer, so an unconverted Short in a
    // [null, int] union throws "Unknown datum type"
    case (s: java.lang.Short, ShortType) => java.lang.Integer.valueOf(s.intValue)
    case (b: java.lang.Byte, ByteType) => java.lang.Integer.valueOf(b.intValue)
    case (t: java.sql.Timestamp, TimestampType) =>
      val i = t.toInstant
      micosOf(i.getEpochSecond, i.getNano)
    case (i: Instant, TimestampType) => micosOf(i.getEpochSecond, i.getNano)
    case (l: LocalDateTime, TimestampNTZType) =>
      micosOf(l.toEpochSecond(ZoneOffset.UTC), l.getNano)
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: LocalDate, DateType) => d.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val out = new java.util.ArrayList[Any](s.length)
      s.foreach(e => out.add(toAvro(e, elem)))
      out
    case (x, _) => x
  }

  /** Avro value → Row cell under the original Catalyst type. NTZ
    * timestamps MUST come back as LocalDateTime (the only external
    * type TimestampNTZType accepts); instants come back as
    * java.sql.Timestamp, accepted under either java8API setting.
    */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (us: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(Instant.ofEpochSecond(
        Math.floorDiv(us.longValue, 1000000L),
        Math.floorMod(us.longValue, 1000000L) * 1000L))
    case (us: java.lang.Long, TimestampNTZType) =>
      LocalDateTime.ofEpochSecond(
        Math.floorDiv(us.longValue, 1000000L),
        (Math.floorMod(us.longValue, 1000000L) * 1000L).toInt,
        ZoneOffset.UTC)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(LocalDate.ofEpochDay(days.longValue))
    case (i: java.lang.Integer, ShortType) => i.shortValue
    case (i: java.lang.Integer, ByteType) => i.byteValue
    case (s: CharSequence, StringType) => s.toString
    case (b: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.util.Collection[_], ArrayType(elem, _)) =>
      l.asScala.iterator.map(e => fromAvro(e, elem)).toSeq
    case (x, _) => x
  }

  /** Write `df` as a directory of Avro container files, one per
    * partition (`part-NNNNN.avro` + a `_schema.avsc` carrying the
    * record schema for readers that want it without opening a data
    * file). Existing contents are replaced.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    // Avro Schema is not serializable — ship its JSON and re-parse per
    // task (the parse is microseconds against a file write)
    val avroJson = toAvroSchema(sparkSchema).toString
    val spark = df.sparkSession
    // Hadoop Configuration is not serializable either; the cached
    // per-context broadcast ships its entries so object-store
    // credentials/endpoints reach the tasks
    val bc = confBroadcast(spark)
    val fs = FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)
    val target = fs.makeQualified(new Path(path))
    // job-unique staging dir beside the target (same FS ⇒ same-volume
    // rename); the target is touched only by the final promote
    val staging = new Path(
      target.getParent,
      s".${target.getName}.__staging-${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(staging)
    var promoteStarted = false
    try {
      val out = fs.create(new Path(staging, "_schema.avsc"))
      out.write(avroJson.getBytes("UTF-8"))
      out.close()
      val types = sparkSchema.fields.map(_.dataType)
      val stagingStr = staging.toString
      df.rdd.mapPartitionsWithIndex { (i, rows) =>
        val conf = new Configuration(false)
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        val schema = new Schema.Parser().parse(avroJson)
        val tfs = FileSystem.get(new URI(stagingStr), conf)
        // attempt-suffixed temp name: a retried task never collides
        // with a dead attempt's partial file
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val tmpFile = new Path(stagingStr, f"part-$i%05d.avro.inprogress-$attempt")
        val finalFile = new Path(stagingStr, f"part-$i%05d.avro")
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        var committed = false
        try {
          w.create(schema, tfs.create(tmpFile))
          var n = 0L
          rows.foreach { row =>
            val rec = new GenericData.Record(schema)
            var j = 0
            while (j < types.length) {
              rec.put(j, toAvro(row.get(j), types(j)))
              j += 1
            }
            w.append(rec)
            n += 1
          }
          w.close()
          // task commit: atomic rename of the COMPLETE container file;
          // if a sibling attempt committed first, its file wins
          if (!tfs.rename(tmpFile, finalFile)) {
            if (!tfs.exists(finalFile))
              throw new java.io.IOException(s"could not commit $tmpFile -> $finalFile")
            tfs.delete(tmpFile, false)
          }
          committed = true
          Iterator.single(n)
        } finally {
          if (!committed) {
            // failed attempt: never leave the partial visible under a
            // committable name (the driver also sweeps at job commit)
            try w.close() catch { case _: Throwable => () }
            try tfs.delete(tmpFile, false) catch { case _: Throwable => () }
          }
        }
      }.count()
      // job commit: sweep partials from hard-killed attempts whose
      // task-side cleanup never ran, then swap staging into place
      fs.listStatus(staging)
        .filter(_.getPath.getName.contains(".inprogress-"))
        .foreach(s => fs.delete(s.getPath, false))
      // past this point staging holds the ONLY complete copy once the
      // old target is deleted — a promote failure must therefore KEEP
      // staging (the catch below only cleans up pre-promote failures,
      // where the old target is still intact)
      promoteStarted = true
      // the clear must be CHECKED: FileSystem.delete reports failure by
      // returning false, and a rename onto a still-existing directory
      // NESTS staging inside it on HDFS (returning true) — silent
      // corruption with stale data visible under the target
      if (fs.exists(target) && !fs.delete(target, true))
        throw new java.io.IOException(
          s"could not clear $target before promote — the complete new " +
            s"data is preserved at $staging for manual recovery")
      if (!fs.rename(staging, target))
        throw new java.io.IOException(
          s"could not promote $staging to $target — the complete new " +
            s"data is preserved at $staging for manual recovery")
    } catch {
      case e: Throwable =>
        if (!promoteStarted) {
          try fs.delete(staging, true) catch { case _: Throwable => () }
        }
        throw e
    }
  }

  /** Read a directory written by [[write]] back under `schema` —
    * one task per container file, rows rebuilt with the exact
    * Catalyst types the writer saw.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path))
      .map(_.getPath.toString)
      .filter(_.endsWith(".avro"))
      .sorted
      .toSeq
    val bc = confBroadcast(spark)
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val conf = new Configuration(false)
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        val in = new FsInput(new Path(f), conf)
        val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
        // STREAM the file — a task must hold one record, not its whole
        // container file, or a large write partition OOMs the read task
        val it = new Iterator[Row] {
          private[this] var open = true
          def close(): Unit = if (open) {
            open = false
            try reader.close() catch { case _: Throwable => () }
          }
          def hasNext: Boolean = {
            if (open && !reader.hasNext) close()
            open
          }
          def next(): Row = {
            if (!hasNext) throw new NoSuchElementException
            val rec = reader.next()
            Row.fromSeq(types.indices.map(j => fromAvro(rec.get(j), types(j))))
          }
        }
        // a partially consumed read (limit/take, downstream exception)
        // never exhausts the iterator — close at task end regardless
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
        it
      }
    spark.createDataFrame(rows, schema)
  }
}
