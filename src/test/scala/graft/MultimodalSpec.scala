package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val media =
    Multimodal.synthesizeMedia(Tables.documents(spark, dir)).cache()

  test("synthesized media table matches the canonical schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "media", "meta"))
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.count() == 500)
  }

  test("partition-wise feature extraction yields normalized fixed-width features") {
    val f = Multimodal.extractFeatures(media).cache()
    assert(f.columns.toSeq == Seq("media_id", "n_bytes", "features"))
    assert(f.count() == 500)
    val row = f.filter("media_id = 0").collect().head
    val feats = row.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == Multimodal.StubDecoder.FeatureDim)
    // histogram is normalized by byte count → sums to ~1
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
    assert(row.getAs[Long]("n_bytes") > 0)
  }

  test("frame sampling explodes payloads into strided fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame"))
    assert(frames.filter("frame_no % 4 != 0").count() == 0)
    // every doc ≥ 32 bytes yields at least one frame
    assert(frames.select("media_id").distinct().count() == 500)
    // deterministic: first frame of doc 0 = first 32 text bytes
    val f0 = frames.filter("media_id = 0 AND frame_no = 0").collect().head
    val txt = Tables.documents(spark, dir).filter("doc_id = 0")
      .collect().head.getAs[String]("text")
    assert(new String(f0.getAs[Array[Byte]]("frame"), "UTF-8") == txt.take(32))
  }

  test("empty payloads contribute zero frames") {
    import spark.implicits._
    val m = Multimodal.synthesizeMedia(
      Seq((1L, ""), (2L, "some actual payload")).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(m)
    assert(frames.filter("media_id = 1").count() == 0)
    assert(frames.filter("media_id = 2").count() == 1)
  }

  // ---- the real codec: netpbm P6 ----

  private def ppm(header: String, pixels: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ pixels

  test("PpmDecoder parses a hand-built P6 image byte-for-byte") {
    // 2x1 image: pixel 0 = (1,2,3), pixel 1 = (250, 0, 255)
    val px = Array[Byte](1, 2, 3, 250.toByte, 0, 255.toByte)
    val f = Multimodal.PpmDecoder.decode(ppm("P6\n2 1\n255\n", px))
    assert(f.toSeq == Seq(2f, 1f, 255f, 2f, 251f, 2f, 258f, 511f))
  }

  test("PpmDecoder skips # comments anywhere in the header") {
    val px = Array[Byte](10, 20, 30)
    val f = Multimodal.PpmDecoder.decode(
      ppm("P6\n# a comment\n1 # trailing\n1\n# another\n255\n", px))
    assert(f.toSeq == Seq(1f, 1f, 255f, 1f, 10f, 20f, 30f, 60f))
  }

  test("PpmDecoder rejects malformed payloads with byte-level reasons") {
    val px = Array[Byte](1, 2, 3)
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](
        Multimodal.PpmDecoder.decode(bytes)).getMessage
    assert(msg("P5\n1 1\n255\n".getBytes("US-ASCII") ++ px).contains("magic"))
    assert(msg(Array.emptyByteArray).contains("magic"))
    assert(msg(ppm("P6\n1 1\n255\n", Array[Byte](1, 2))).contains("truncated"))
    assert(msg(ppm("P6\n1 1\n999\n", px)).contains("maxval"))
    assert(msg(ppm("P6\n1 1\n", Array.emptyByteArray)).contains("maxval"))
    assert(msg(ppm("P6\nx 1\n255\n", px)).contains("width"))
  }

  test("synthesizePpm payloads round-trip through the real decoder") {
    val m = Multimodal.synthesizePpm(Tables.documents(spark, dir))
    val out = Multimodal.extractFeatures(m, Multimodal.PpmDecoder)
      .join(m.select("media_id", "meta"), "media_id")
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      // decoded dims must equal the metadata the synthesizer declared
      assert(f(0) == meta.getAs[Int]("width").toFloat)
      assert(f(1) == meta.getAs[Int]("height").toFloat)
      assert(f(2) == 255f)
      assert(f(3) == f(0) * f(1))
      // channel sums: every pixel byte is in 32..126
      assert(f(7) == f(4) + f(5) + f(6))
      assert(f(7) >= 32 * 3 * f(3) && f(7) <= 126 * 3 * f(3))
    }
  }

  test("extractFeaturesPermissive carries malformed payloads as data") {
    import spark.implicits._
    val good = ppm("P6\n1 1\n255\n", Array[Byte](5, 6, 7))
    val bad = "not a ppm at all".getBytes("US-ASCII")
    val m = Seq((1L, good), (2L, bad), (3L, null: Array[Byte]))
      .toDF("media_id", "media")
    val out = Multimodal.extractFeaturesPermissive(m, Multimodal.PpmDecoder)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[String]("decode_error") == null)
    assert(out(1L).getAs[scala.collection.Seq[Float]]("features").toSeq ==
      Seq(1f, 1f, 255f, 1f, 5f, 6f, 7f, 18f))
    assert(out(2L).getAs[String]("decode_error").contains("magic"))
    assert(out(2L).getAs[scala.collection.Seq[Float]]("features") == null)
    // NULL payload → empty bytes → malformed, not an NPE
    assert(out(3L).getAs[String]("decode_error").contains("magic"))
    assert(out(3L).getAs[Long]("n_bytes") == 0L)
  }

  test("a custom MediaDecoder plugs into extractFeatures with per-partition open()") {
    import spark.implicits._
    // 2-dim "codec": [length, first byte] — plus an open() marker that
    // must run on the executor before any decode
    object LenDecoder extends Multimodal.MediaDecoder {
      override def featureDim: Int = 2
      @transient private var opened = false
      override def open(): Unit = { opened = true }
      override def decode(bytes: Array[Byte]): Array[Float] = {
        assert(opened, "decode() before open(): per-partition init contract broken")
        Array(bytes.length.toFloat, if (bytes.isEmpty) 0f else (bytes(0) & 0xff).toFloat)
      }
    }
    val m = Multimodal.synthesizeMedia(
      Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text"))
    val out = Multimodal.extractFeatures(m, LenDecoder).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features").toSeq).toMap
    assert(out(1L) == Seq(3f, 'a'.toFloat))
    assert(out(2L) == Seq(0f, 0f))
  }
}
