package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, processed partition-wise.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * image/audio codecs — but everything Spark-side is real and tested:
  * the schema contract, the partition-wise batch shape (decoder
  * initialized once per partition, amortized over its rows — the
  * pattern a JNI libjpeg/ffmpeg binding needs), the fixed-width
  * feature output, and the explode-style frame sampling. Swapping
  * [[StubDecoder]] for a real codec changes no plan shape.
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build a media table from any (id, string-payload) source — used
    * by tests/demos to exercise the pipeline on the `documents` table
    * with text bytes standing in for encoded frames.
    */
  def synthesizeMedia(docs: DataFrame, idCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit("stub/raw").as("format"),
        (octet_length(col(payloadCol)) % 640).cast("int").as("width"),
        (octet_length(col(payloadCol)) % 480).cast("int").as("height")).as("meta"))

  /** The codec seam: a production build plugs a real decoder
    * (libjpeg/ffmpeg via JNI, or a sidecar process) in here and the
    * plan shape does not change. The contract is deliberately thin:
    *
    *   - `open()` is called once per PARTITION, on the executor,
    *     before any row — the place to load native libraries or
    *     spawn the sidecar (the cost that must amortize over rows)
    *   - `decode` maps one payload to a fixed-`featureDim` vector
    *   - instances must be Serializable: the object is constructed on
    *     the driver and shipped in the task closure, so heavyweight
    *     native state belongs in `open()`-initialized transients, not
    *     constructor fields
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** STUB decoder — this container has no image/audio codecs; the
    * deterministic fake — a 16-bin byte histogram — keeps tests
    * meaningful without native deps.
    */
  object StubDecoder extends MediaDecoder {
    val FeatureDim = 16
    override def featureDim: Int = FeatureDim
    /** ??? real codec goes here ??? — deterministic fake decode. */
    override def decode(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 4) += 1f
        i += 1
      }
      val n = math.max(1, bytes.length).toFloat
      hist.map(_ / n)
    }
  }

  /** Feature extraction over the media column: mapPartitions so the
    * decoder opens once per partition, not per row — the batch shape
    * that matters at 100 TB where codec init dominates per-row cost.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init happens HERE, once per partition
        decoder.open()
        rows.map { case (id, bytes) =>
          // mediaSchema declares the payload nullable — treat NULL as
          // an empty payload (zero-length, all-zero histogram) instead
          // of NPEing the task
          val b = if (bytes == null) Array.emptyByteArray else bytes
          (id, b.length.toLong, decoder.decode(b))
        }
      }
      .toDF("media_id", "n_bytes", "features")
  }

  /** Frame sampling: split the payload into fixed-size "frames" and
    * keep every `stride`-th one — pure plan-side (explode), so the
    * fan-out is distributed, not driver-side.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    media
      .filter(octet_length(col("media")) > 0) // empty payload → zero frames
      .select(
      col("media_id"),
      posexplode(
        expr(s"transform(sequence(0, greatest(0, CAST(ceil(octet_length(media) / $frameBytes.0D) AS INT) - 1)), i -> substring(media, i * $frameBytes + 1, $frameBytes))"))
        .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0)
}
