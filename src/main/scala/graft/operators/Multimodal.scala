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
  /** Parsed P6 header: dimensions, maxval, and the byte offset of the
    * first pixel. Shared by every PPM-consuming decoder so the
    * byte-level header rules (comments, the single-whitespace
    * mandate, truncation) are implemented exactly once.
    */
  private[operators] final case class PpmHeader(w: Int, h: Int, maxval: Int, pixelOffset: Int)

  /** Byte-level P6 header parse — fails with the byte-level reason on
    * malformed input, and verifies the payload carries the full
    * `w*h*3` pixel bytes the header promises.
    */
  private[operators] def parsePpmHeader(bytes: Array[Byte]): PpmHeader = {
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
    PpmHeader(w, h, maxval, pos)
  }

  object PpmDecoder extends MediaDecoder {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim
    override def decode(bytes: Array[Byte]): Array[Float] = {
      val hd = parsePpmHeader(bytes)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      val base = hd.pixelOffset
      val end = hd.w * hd.h * 3
      while (i < end) {
        val v = bytes(base + i) & 0xff
        val c = i % 3
        if (c == 0) sr += v else if (c == 1) sg += v else sb += v
        i += 1
      }
      Array(hd.w.toFloat, hd.h.toFloat, hd.maxval.toFloat, (hd.w * hd.h).toFloat,
        sr.toFloat, sg.toFloat, sb.toFloat, (sr + sg + sb).toFloat)
    }
  }

  /** dHash sampling grid: 9×8 cells → 8×8 = 64 difference bits (the
    * published difference-hash construction: Krawetz, "Kind of Like
    * That", hackerfactor 2013 — compare each cell to its right
    * neighbor). 72 cells, row-major `cell(gx, gy) = features[gy*9+gx]`.
    */
  val DhashGridW = 9
  val DhashGridH = 8

  /** REAL perceptual-feature codec: parse the P6 payload and sample a
    * [[DhashGridW]]×[[DhashGridH]] grayscale grid by nearest-neighbor
    * — `x = gx·w/9, y = gy·h/8` — emitting each cell's exact integer
    * gray value (the R+G+B byte sum, ≤ 765, lossless in float32).
    * Resolution-independent by construction: the same scene at any
    * `w×h ≥ grid` samples the same relative positions, which is what
    * makes the downstream difference hash a PERCEPTUAL key rather
    * than a byte key. Malformed payloads fail like [[PpmDecoder]]
    * (same header parser); pair with [[extractFeaturesPermissive]]
    * to carry errors as data.
    */
  object PpmGridDecoder extends MediaDecoder {
    val FeatureDim: Int = DhashGridW * DhashGridH
    override def featureDim: Int = FeatureDim
    override def decode(bytes: Array[Byte]): Array[Float] = {
      val hd = parsePpmHeader(bytes)
      val out = new Array[Float](FeatureDim)
      var gy = 0
      while (gy < DhashGridH) {
        // sample coordinates in Long: the header parser admits w,h up
        // to the byte-budget bound, so gx·w can exceed Int range on a
        // legitimately wide payload (gx=8, w≈2^28) — the quotient is
        // always < w (resp. h), so the narrowing back is exact
        val y = (gy.toLong * hd.h / DhashGridH).toInt
        var gx = 0
        while (gx < DhashGridW) {
          val x = (gx.toLong * hd.w / DhashGridW).toInt
          val p = hd.pixelOffset + 3 * (y * hd.w + x)
          out(gy * DhashGridW + gx) =
            ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)).toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }
  }

  /** BIGINT literal for bit `t` of a packed 64-bit hash — spelled to
    * parse in BOTH dialects (a bare `-9223372036854775808` literal
    * overflows the positive-literal parse in some engines).
    */
  private def bitLit(t: Int): String =
    if (t == 63) "(-9223372036854775807 - 1)" else (1L << t).toString

  /** The 64-bit difference hash packed from the 72 grid cells, as a
    * paired Spark/DuckDB expression (one definition of semantics, two
    * dialects — the [[graft.functions.VectorExprs]] convention). Bit
    * `t = gy*8 + gx` is `cell(gx+1, gy) > cell(gx, gy)`; bits combine
    * by bitwise OR (disjoint, so no ANSI overflow on bit 63). Spark
    * indexes the features array 0-based, DuckDB lists 1-based.
    */
  def dhashSpark(features: String): String =
    (0 until 64).map { t =>
      val gx = t % 8; val gy = t / 8
      val c = gy * DhashGridW + gx
      s"(CASE WHEN $features[${c + 1}] > $features[$c] THEN CAST(${bitLit(t)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " | ", ")")

  def dhashDuck(cells: String): String =
    (0 until 64).map { t =>
      val gx = t % 8; val gy = t / 8
      val c = gy * DhashGridW + gx
      s"(CASE WHEN $cells[${c + 2}] > $cells[${c + 1}] THEN CAST(${bitLit(t)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " | ", ")")

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

  /** [[synthesizePpm]]'s TEXTURED sibling, built for perceptual-hash
    * fixtures: dimensions `(12 + id%8) × (9 + id%5)` are at least the
    * dHash grid (so grid sampling is a true downsample — each cell
    * reads a distinct pixel and a localized pixel edit perturbs a
    * BOUNDED number of hash bits), and the pixel byte mixes quadratic
    * and cross terms (`id·31 + i·7 + (i²·13 + id²·17 + id·i·29) mod
    * 9973`, all mod 95 into printable ASCII) so distinct documents'
    * hashes behave pseudo-randomly instead of inheriting the linear
    * generator's correlations (measured: nearest non-planted pair at
    * Hamming ≥ 5 for 5,000 docs, vs Hamming 0 collisions under the
    * linear formula). `perturb = true` rotates one channel byte of
    * three pixels (first, middle, last — by +41 mod 95) — the
    * "re-encoded / lightly edited copy" fixture, which lands within
    * Hamming 0–3 of its original; `mediaIdOffset` relabels the copies
    * while the payload formulas keep using the SOURCE doc id.
    */
  def synthesizePpmTextured(
      docs: DataFrame,
      idCol: String = "doc_id",
      mediaIdOffset: Long = 0L,
      perturb: Boolean = false): DataFrame = {
    val id = idCol
    val w = s"(12 + $id % 8)"
    val h = s"(9 + $id % 5)"
    val shift =
      if (!perturb) "0"
      else s"(CASE WHEN i IN (0, 3 * (($w * $h) DIV 2), 3 * ($w * $h - 1)) THEN 41 ELSE 0 END)"
    docs.select(
      (col(idCol).cast("long") + lit(mediaIdOffset)).as("media_id"),
      expr(
        s"""CAST(
           |  'P6' || char(10) || '# doc ' || CAST($id AS STRING) || char(10) ||
           |  CAST($w AS STRING) || ' ' || CAST($h AS STRING) || char(10) ||
           |  '255' || char(10) ||
           |  array_join(
           |    transform(
           |      sequence(0, CAST($w * $h * 3 - 1 AS INT)),
           |      i -> char(32 + pmod($id * 31 + i * 7 + pmod(i * i * 13 + $id * $id * 17 + $id * i * 29, 9973) + $shift, 95))),
           |    '')
           |AS BINARY)""".stripMargin).as("media"),
      struct(
        lit("image/x-portable-pixmap").as("format"),
        (lit(12) + pmod(col(idCol), lit(8))).cast("int").as("width"),
        (lit(9) + pmod(col(idCol), lit(5))).cast("int").as("height")).as("meta"))
  }

  /** PERCEPTUAL near-duplicate pairs over a media table — the media
    * granularity of the dedup family: decode every payload through
    * the grid decoder ([[extractFeatures]] — real byte parsing, once
    * -per-partition decoder init), pack the 72 grid cells into the
    * 64-bit difference hash, and find all pairs within `maxHamming`
    * via the SimHash pigeonhole multi-index
    * ([[Dedup.hammingPairs]] — an equi-join on (segment, segment
    * value), never an all-pairs sweep; the pigeonhole candidates are
    * LOSSLESS for Hamming ≤ maxHamming, so this is exact, not
    * approximate). Catches re-encoded copies (same pixels, different
    * header/metadata → byte hashes differ, dHash identical) and
    * lightly edited copies (small pixel deltas → small Hamming),
    * which byte-level dedup ([[Dedup.mediaDedupExact]]) cannot.
    *
    * Scale shape: one decode pass (payload-width), then everything
    * downstream is 8-byte hashes — the candidate join shuffles
    * (media_id, hash, segment) rows only. Returns
    * (media_a, media_b, hamming).
    */
  /** `permissive = true` routes the decode through
    * [[extractFeaturesPermissive]] and SKIPS undecodable payloads
    * (an asset that cannot decode has no perceptual hash — it simply
    * never pairs) instead of failing the job on the first NULL or
    * corrupt payload. At 100 TB a media corpus WILL contain both, and
    * one bad row must not kill a thousand-executor near-dup pass;
    * the strict default keeps the fail-fast semantics for curated
    * inputs where a corrupt payload indicates an upstream bug.
    */
  def perceptualHashPairs(
      media: DataFrame,
      decoder: MediaDecoder = PpmGridDecoder,
      maxHamming: Int = 4,
      idCol: String = "media_id",
      pigeonhole: Boolean = true,
      permissive: Boolean = false,
      maxDocsPerSegment: Int = 0): DataFrame = {
    require(decoder.featureDim == DhashGridW * DhashGridH,
      s"perceptualHashPairs needs a ${DhashGridW}x$DhashGridH grid decoder " +
        s"(featureDim ${DhashGridW * DhashGridH}), got ${decoder.featureDim}")
    val renamed = media.withColumnRenamed(idCol, "media_id")
    val feats =
      if (!permissive) extractFeatures(renamed, decoder)
      else extractFeaturesPermissive(renamed, decoder)
        .filter(col("decode_error").isNull)
    val fp = feats.select(
      col("media_id").as("doc_id"),
      expr(dhashSpark("features")).as("fph"))
    Dedup.hammingPairs(fp, maxHamming = maxHamming, bits = 64,
      pigeonhole = pigeonhole, maxDocsPerSegment = maxDocsPerSegment)
      .select(
        col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))
  }

  /** A media table's perceptual fingerprints — (doc_id, fph): the
    * decode → grid → dHash front shared by the batch pairs, the
    * incremental probe, and the persisted state writer. The owner id
    * lands under `doc_id` (the state-table convention every
    * tombstone/mask verb keys on).
    */
  def mediaDhashFingerprints(
      media: DataFrame,
      decoder: MediaDecoder = PpmGridDecoder,
      idCol: String = "media_id",
      permissive: Boolean = false): DataFrame = {
    require(decoder.featureDim == DhashGridW * DhashGridH,
      s"mediaDhashFingerprints needs a ${DhashGridW}x$DhashGridH grid decoder " +
        s"(featureDim ${DhashGridW * DhashGridH}), got ${decoder.featureDim}")
    val renamed = media.withColumnRenamed(idCol, "media_id")
    val feats =
      if (!permissive) extractFeatures(renamed, decoder)
      else extractFeaturesPermissive(renamed, decoder)
        .filter(col("decode_error").isNull)
    feats.select(
      col("media_id").as("doc_id"),
      expr(dhashSpark("features")).as("fph"))
  }

  /** Persist a media corpus's perceptual-hash state — the dHash
    * pigeonhole segment rows in a bucketed catalog table
    * ([[graft.operators.Dedup.writeHammingTable]]): the media
    * granularity's band table. A steady-state ingest probes it with
    * [[perceptualHashPairsAgainst]] — only the batch decodes and
    * shuffles; takedowns ride `Dedup.deleteFromStateTable` +
    * `Dedup.compactHammingTable` like every other persisted state.
    * `permissive` matches the probe paths' contract (ADVICE r15: the
    * corpus state build is the LARGEST decode pass of all, so it is
    * the last place one corrupt payload should be able to kill the
    * job — an undecodable asset simply contributes no segment rows).
    */
  def writeDhashTable(
      media: DataFrame, table: String,
      decoder: MediaDecoder = PpmGridDecoder,
      maxHamming: Int = 4,
      buckets: Int = Dedup.BandTableBuckets,
      idCol: String = "media_id",
      permissive: Boolean = false): DataFrame =
    Dedup.writeHammingTable(
      mediaDhashFingerprints(media, decoder, idCol, permissive), table, maxHamming,
      bits = 64, buckets = buckets)

  /** Perceptual near-dup pairs of a NEW media batch against a
    * PERSISTED corpus state ([[writeDhashTable]]) — the media
    * granularity's ingest shape: decode the batch, segment its
    * hashes, equi-join against the pre-bucketed segment table, refine
    * by exact Hamming. O(batch) decode + hash-width probe; the corpus
    * payloads never re-decode. Returns (new_id, corpus_id, hamming).
    */
  def perceptualHashPairsAgainst(
      newMedia: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      decoder: MediaDecoder = PpmGridDecoder,
      maxHamming: Int = 4,
      idCol: String = "media_id",
      permissive: Boolean = false,
      maxCorpusDocsPerSegment: Int = 0): DataFrame =
    Dedup.hammingPairsAgainst(
      mediaDhashFingerprints(newMedia, decoder, idCol, permissive),
      Dedup.hammingTableLive(spark, table, maxHamming, bits = 64),
      maxHamming, bits = 64,
      maxCorpusDocsPerSegment = maxCorpusDocsPerSegment)
      .select(
        col("new_id").as("new_media"), col("corpus_id").as("corpus_media"),
        col("hamming"))

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
