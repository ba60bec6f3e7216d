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
