package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Differential codec spec: a REAL pure-JVM PNG decoder drops in behind
  * the [[MediaCodec]] seam with zero operator changes, and reads
  * pixels where the stub reads bytes. The stub stays the oracle
  * implementation for the registered mm queries. */
class ImageIoCodecSpec extends AnyFunSuite with SparkTestSession {

  private def png(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, pixel(x, y))))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def corpus(payloads: Seq[Array[Byte]]) = {
    import spark.implicits._
    payloads.zipWithIndex
      .map { case (p, i) => (i.toLong, p, "png") }
      .toDF("media_id", "payload", "format")
  }

  private def feats(df: org.apache.spark.sql.DataFrame, codec: MediaCodec) =
    Multimodal.extractFeatures(df, dim = 8, codec = codec)

  test("both codecs run the identical operator pipeline: same schema, rows, ids") {
    val df = corpus(Seq(png(8, 8, (x, y) => (x * 32) << 16), png(8, 8, (_, _) => 0xFFFFFF)))
    val stub = feats(df, StubCodec)
    val real = feats(df, new ImageIoCodec)
    assert(stub.schema === real.schema, "the seam must not leak into the schema")
    assert(stub.count() === 2 && real.count() === 2)
    assert(real.select("media_id").orderBy("media_id").collect().map(_.getLong(0)).toSeq ===
      Seq(0L, 1L))
  }

  test("the real codec reads pixels, not bytes: trailing junk changes the stub, not the decode") {
    val base = png(10, 6, (x, y) => (x * 20) << 16 | (y * 40) << 8)
    // same pixels, different bytes - ImageIO stops at IEND
    val junked = base ++ Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val df = corpus(Seq(base, junked))
    def vecs(c: MediaCodec): Seq[Seq[Float]] =
      feats(df, c).orderBy("media_id").collect()
        .map(_.getAs[scala.collection.Seq[Float]]("features").toSeq).toSeq
    val real = vecs(new ImageIoCodec)
    assert(real(0) === real(1),
      "identical decoded pixels must give identical pixel-space features")
    val stub = vecs(StubCodec)
    assert(stub(0) !== stub(1),
      "the byte-fold stub must see the trailing junk (differential sanity)")
    // and the pixel features respond to pixel content
    val other = vecs(new ImageIoCodec) // determinism across runs
    assert(other === real)
    val changed = corpus(Seq(base, png(10, 6, (x, y) => (x * 20) << 16 | (y * 40) << 8 | 0x80)))
    val cv = feats(changed, new ImageIoCodec).orderBy("media_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("features").toSeq)
    assert(cv(0) !== cv(1), "different pixels must change the features")
  }

  test("mm05's perceptual-hash shape runs unchanged over the real codec") {
    // the downstream pipeline (mean threshold -> bit pack -> group) is
    // codec-agnostic: only the feature VALUES differ
    val df = corpus(Seq(
      png(8, 8, (x, _) => (x * 30) << 16),
      png(8, 8, (x, _) => (x * 30) << 16),
      png(8, 8, (_, y) => (255 - y * 30) & 0xFF)))
    def phashes(c: MediaCodec): Seq[(Long, Long)] = {
      val f = feats(df, c).select(col("media_id"),
        transform(col("features"), x => x.cast("double")).as("fd"))
        .select(col("media_id"), col("fd"),
          (aggregate(col("fd"), lit(0.0), (a, x) => a + x) / lit(8.0)).as("mean"))
      val bits = (0 until 8).map(j =>
        when(element_at(col("fd"), j + 1) > col("mean"), lit(1L << j))
          .otherwise(lit(0L))).reduce(_ + _)
      f.select(col("media_id"), bits.as("phash")).orderBy("media_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val real = phashes(new ImageIoCodec)
    assert(real(0)._2 === real(1)._2, "identical images must collide in phash space")
    assert(phashes(StubCodec).map(_._1) === real.map(_._1))
  }

  test("non-image payloads fall back: mixed-modality frames keep flowing") {
    import spark.implicits._
    val textPayload = "not a png at all".getBytes("UTF-8")
    val df = Seq((1L, textPayload, "wav"), (2L, png(4, 4, (_, _) => 0x808080), "png"))
      .toDF("media_id", "payload", "format")
    val real = feats(df, new ImageIoCodec).orderBy("media_id").collect()
    val stubOnText = StubCodec.decode(textPayload, 8).toSeq
    assert(real(0).getAs[scala.collection.Seq[Float]]("features").toSeq === stubOnText,
      "undecodable payloads must take the fallback path")
    assert(real(1).getAs[scala.collection.Seq[Float]]("features").toSeq !== stubOnText)
  }
}
