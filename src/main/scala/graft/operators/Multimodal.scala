package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, processed partition-wise.
  *
  * Two decoders ship behind the [[MediaDecoder]] seam:
  * [[PpmDecoder]] is a REAL byte-level parser for the public
  * netpbm P6 format (binary PPM — header tokens, `#` comments,
  * per-channel pixel sums), and [[StubDecoder]] is a deterministic
  * byte-histogram fake standing in for codecs this container lacks
  * (JPEG/audio/video need native libs). Everything Spark-side is
  * identical for both: the schema contract, the partition-wise
  * batch shape (decoder initialized once per partition, amortized
  * over its rows — the pattern a JNI libjpeg/ffmpeg binding needs),
  * the fixed-width feature output, and the explode-style frame
  * sampling. Swapping decoders changes no plan shape.
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

  /** STUB decoder — stand-in for codecs that need native libraries
    * (JPEG/audio/video); the deterministic fake — a 16-bin byte
    * histogram — keeps tests meaningful without native deps. For a
    * real decode exercised end-to-end, see [[PpmDecoder]].
    */
  object StubDecoder extends MediaDecoder {
    val FeatureDim = 16
    override def featureDim: Int = FeatureDim
    /** Deterministic fake decode: normalized 16-bin byte histogram. */
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

  /** REAL codec: a byte-level parser for the netpbm binary PPM
    * format (P6 — a public format, spec at netpbm.sourceforge.net):
    * `P6`, whitespace-separated width/height/maxval tokens with `#`
    * comments running to end-of-line, ONE whitespace byte, then
    * `width*height*3` raw RGB bytes. Emits 8 features — all small
    * exact integers, so they survive the float32 feature vector
    * losslessly below 2^24:
    *
    *   [width, height, maxval, n_pixels, sum_r, sum_g, sum_b, sum_all]
    *
    * Malformed payloads (wrong magic, missing tokens, junk maxval,
    * truncated pixel data) throw `IllegalArgumentException` with the
    * byte-level reason — callers choose fail-fast
    * ([[extractFeatures]]) or carry-the-error
    * ([[extractFeaturesPermissive]]), the same mode split Spark's
    * own malformed-record sources expose.
    */
  object PpmDecoder extends MediaDecoder {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim
    override def decode(bytes: Array[Byte]): Array[Float] = {
      var pos = 0
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed PPM: $msg")
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def skipWsAndComments(): Unit = {
        var done = false
        while (!done && pos < bytes.length) {
          val b = bytes(pos)
          if (b == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else if (isWs(b)) pos += 1
          else done = true
        }
      }
      def nextInt(what: String): Int = {
        skipWsAndComments()
        val start = pos
        var v = 0
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0')
          if (v > (1 << 28)) fail(s"$what out of range")
          pos += 1
        }
        if (pos == start) fail(s"expected $what digits at byte $pos")
        v
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
        fail("magic is not P6")
      pos = 2
      val w = nextInt("width")
      val h = nextInt("height")
      val maxval = nextInt("maxval")
      if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
      if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
      // the spec mandates EXACTLY one whitespace byte before pixels
      if (pos >= bytes.length || !isWs(bytes(pos)))
        fail("missing whitespace after maxval")
      pos += 1
      val need = w.toLong * h * 3
      if (bytes.length - pos < need)
        fail(s"truncated pixel data: need $need, have ${bytes.length - pos}")
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      val base = pos
      val end = need.toInt
      while (i < end) {
        val v = bytes(base + i) & 0xff
        val c = i % 3
        if (c == 0) sr += v else if (c == 1) sg += v else sb += v
        i += 1
      }
      Array(w.toFloat, h.toFloat, maxval.toFloat, (w * h).toFloat,
        sr.toFloat, sg.toFloat, sb.toFloat, (sr + sg + sb).toFloat)
    }
  }

  /** Build a REAL-format media table: each document becomes a valid
    * binary PPM (P6) image whose dimensions and pixel bytes derive
    * deterministically from `doc_id` — the planted-fixture
    * convention, so the DuckDB oracle recomputes the expected
    * features from the same formulas while the Spark side must
    * actually PARSE the bytes (a header or offset bug diverges the
    * hashes). Pixel bytes stay in the printable-ASCII range 32..126
    * so the string→binary cast is byte-exact in both engines; the
    * header exercises the `#` comment rule.
    */
  def synthesizePpm(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      expr(
        s"""CAST(
           |  'P6' || char(10) || '# doc ' || CAST($idCol AS STRING) || char(10) ||
           |  CAST(4 + $idCol % 8 AS STRING) || ' ' || CAST(3 + $idCol % 5 AS STRING) || char(10) ||
           |  '255' || char(10) ||
           |  array_join(
           |    transform(
           |      sequence(0, CAST((4 + $idCol % 8) * (3 + $idCol % 5) * 3 - 1 AS INT)),
           |      i -> char(32 + pmod($idCol * 31 + i * 7, 95))),
           |    '')
           |AS BINARY)""".stripMargin).as("media"),
      struct(
        lit("image/x-portable-pixmap").as("format"),
        (lit(4) + pmod(col(idCol), lit(8))).cast("int").as("width"),
        (lit(3) + pmod(col(idCol), lit(5))).cast("int").as("height")).as("meta"))

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

  /** Permissive variant of [[extractFeatures]]: a malformed payload
    * becomes data (`features` NULL + `decode_error` message) instead
    * of killing the job — at 100 TB a corpus WILL contain corrupt
    * payloads, and one bad row must not fail a thousand-executor
    * stage. Same per-partition `open()` contract.
    */
  def extractFeaturesPermissive(
      media: DataFrame, decoder: MediaDecoder = PpmDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.open()
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          try (id, b.length.toLong, decoder.decode(b), null: String)
          catch {
            case scala.util.control.NonFatal(e) =>
              (id, b.length.toLong, null: Array[Float], e.getMessage)
          }
        }
      }
      .toDF("media_id", "n_bytes", "features", "decode_error")
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
