package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private lazy val media = Multimodal.mediaCorpus(Tables.documents(spark, sf))

  test("media corpus: binary payload, typed metadata, formats from fixed set") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val formats = media.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(formats.subsetOf(Set("jpeg", "png", "wav")))
    assert(media.count() > 0)
  }

  test("extractFeatures: fixed-width vectors, byte_len matches payload, joinable on media_id") {
    val feats = Multimodal.extractFeatures(media, dim = 8).cache()
    assert(feats.count() === media.count())
    assert(feats.filter(size(col("features")) =!= 8).count() === 0)
    val joined = feats.join(media, "media_id")
      .filter(length(col("payload")) =!= col("byte_len"))
    assert(joined.count() === 0)
  }

  test("frame sampling: chunk math and determinism") {
    val frames = Multimodal.sampleFrames(media, frameSize = 32, everyK = 4).cache()
    val bad = frames.join(media, "media_id")
      .filter(col("n_frames") =!= ceil(length(col("payload")) / 32.0).cast("int") ||
        col("sampled_frames") =!= ceil(col("n_frames") / 4.0).cast("int"))
    assert(bad.count() === 0)
    // deterministic CRC across runs
    val a = frames.orderBy("media_id").collect().map(_.getLong(4)).toSeq
    val b = Multimodal.sampleFrames(media, 32, 4).orderBy("media_id").collect().map(_.getLong(4)).toSeq
    assert(a === b)
  }

  test("resize: output bounded, short payloads untouched") {
    val resized = Multimodal.resize(media, targetBytes = 16).cache()
    assert(resized.filter(length(col("resized")) > 16).count() === 0)
    val joined = resized.join(media, "media_id")
      .filter(length(col("payload")) <= 16 && col("resized") =!= col("payload"))
    assert(joined.count() === 0)
  }

  test("stub codec is deterministic and matches a hand computation") {
    val payload = "abcd".getBytes("UTF-8") // 97 98 99 100
    val f = Multimodal.decodeStub(payload, 2)
    // bins: (97+99)/4, (98+100)/4
    assert(f.toSeq === Seq(49.0f, 49.5f))
    assert(Multimodal.decodeStub(payload, 2).toSeq === f.toSeq)
  }

  test("codec seam: a replacement codec drops in without touching the operators") {
    // stands in for a real JPEG/audio decoder: constant-vector "decode"
    object LenCodec extends MediaCodec {
      override def decode(payload: Array[Byte], dim: Int): Array[Float] =
        Array.fill(dim)(payload.length.toFloat)
    }
    val feats = Multimodal.extractFeatures(media, dim = 3, codec = LenCodec)
      .select(col("media_id"), col("byte_len"), col("features"))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val len = r.getInt(1).toFloat
      assert(r.getSeq[Float](2) === Seq(len, len, len))
    }
    // and the default path is still the IEEE-pinned stub (mm02's oracle)
    val stub = Multimodal.extractFeatures(media, dim = 2)
    val direct = media.collect().map(r =>
      r.getLong(0) -> StubCodec.decode(r.getAs[Array[Byte]]("payload"), 2).toSeq).toMap
    stub.select(col("media_id"), col("features")).collect().foreach { r =>
      assert(r.getSeq[Float](1) === direct(r.getLong(0)))
    }
  }
}
