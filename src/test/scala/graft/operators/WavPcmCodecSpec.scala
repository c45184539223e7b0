package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Differential codec spec #2: a REAL pure-JVM WAV/PCM decoder behind
  * the [[MediaCodec]] seam — reads samples where the stub reads bytes —
  * and codec COMPOSITION over a mixed png|wav corpus. */
class WavPcmCodecSpec extends AnyFunSuite with SparkTestSession {

  /** Minimal RIFF/WAVE PCM16 container around `samples`, with optional
    * extra metadata chunks before/after the data chunk. */
  private def wav(samples: Array[Short], pre: Int = 0, post: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xFF))
    def le16(v: Int): Unit = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xFF))
    def junkChunk(n: Int): Unit =
      if (n > 0) { tag("LIST"); le32(n); (0 until n).foreach(i => out.write(i * 13 & 0xFF)) }
    val dataSz = samples.length * 2
    tag("RIFF"); le32(0); tag("WAVE") // RIFF size unchecked by the parser
    tag("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    junkChunk(pre)
    tag("data"); le32(dataSz); samples.foreach(s => le16(s & 0xFFFF))
    junkChunk(post)
    out.toByteArray
  }

  private def png(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, pixel(x, y))))
    val o = new ByteArrayOutputStream(); ImageIO.write(img, "png", o); o.toByteArray
  }

  private def corpus(payloads: Seq[(Array[Byte], String)]) = {
    import spark.implicits._
    payloads.zipWithIndex.map { case ((p, f), i) => (i.toLong, p, f) }
      .toDF("media_id", "payload", "format")
  }

  private def vecs(df: org.apache.spark.sql.DataFrame, c: MediaCodec): Seq[Seq[Float]] =
    Multimodal.extractFeatures(df, dim = 4, codec = c).orderBy("media_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("features").toSeq).toSeq

  private val tone: Array[Short] =
    Array.tabulate(400)(i => ((i % 40) * 800 - 16000).toShort)

  test("the codec reads samples, not container bytes: metadata chunks don't change features") {
    val df = corpus(Seq(wav(tone) -> "wav", wav(tone, pre = 32) -> "wav",
      wav(tone, post = 17) -> "wav")) // odd size exercises word-align padding
    val real = vecs(df, new WavPcmCodec)
    assert(real(0) === real(1) && real(0) === real(2),
      "identical samples must give identical features whatever the container")
    val stub = vecs(df, StubCodec)
    assert(stub(0) !== stub(1), "the byte-fold stub must see the container difference")
    // features respond to the audio content itself
    val louder = corpus(Seq(wav(tone) -> "wav",
      wav(tone.map(s => (s * 2).toShort)) -> "wav"))
    val lv = vecs(louder, new WavPcmCodec)
    assert(lv(0) !== lv(1), "different samples must change the features")
  }

  test("non-PCM16 and truncated payloads fall back instead of failing the partition") {
    val compressed = {
      val b = wav(tone)
      b(20) = 2 // fmt audioFormat = 2 (ADPCM) — not PCM16
      b
    }
    val truncated = wav(tone).take(50)
    val df = corpus(Seq(compressed -> "wav", truncated -> "wav"))
    val real = vecs(df, new WavPcmCodec)
    val stub = vecs(df, StubCodec)
    assert(real === stub, "undecodable payloads must take the fallback path")
  }

  test("a crafted chunk size near Int.MaxValue falls back instead of wrapping the bounds check") {
    // a corrupt/adversarial RIFF declaring a ~2GB data chunk: Int
    // arithmetic would wrap `off + 8 + sz` negative, bypass the bounds
    // check and try to allocate ~1G samples / read out of bounds —
    // the Long-math check must send it down the fallback path instead
    def evil(sz: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xFF))
      def le16(v: Int): Unit = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xFF))
      tag("RIFF"); le32(0); tag("WAVE")
      tag("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
      tag("data"); le32(sz); (0 until 64).foreach(_ => out.write(1))
      out.toByteArray
    }
    val payloads = Seq(evil(Int.MaxValue - 4) -> "wav", evil(0x7FFFFFF0) -> "wav")
    val real = vecs(corpus(payloads), new WavPcmCodec)
    val stub = vecs(corpus(payloads), StubCodec)
    assert(real === stub, "overflowing chunk sizes must take the fallback path")
  }

  test("codecs compose across modalities: png rows decode pixels, wav rows decode samples") {
    val image = png(8, 8, (x, y) => (x * 30) << 16 | (y * 30) << 8)
    val df = corpus(Seq(image -> "png", wav(tone) -> "wav", wav(tone, pre = 32) -> "wav"))
    val composed = vecs(df, new ImageIoCodec(new WavPcmCodec))
    assert(composed(1) === composed(2), "wav rows must take the sample path")
    assert(composed(0) === vecs(corpus(Seq(image -> "png")), new ImageIoCodec).head,
      "png rows must take the pixel path")
    assert(composed(1) === vecs(corpus(Seq(wav(tone) -> "wav")), new WavPcmCodec).head)
  }
}
