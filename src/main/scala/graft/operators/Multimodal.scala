package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed multimodal record: opaque binary payload + typed metadata. */
final case class MediaRecord(media_id: Long, payload: Array[Byte], format: String)

/** Decoded feature row produced by the (stubbed) codec stage. */
final case class MediaFeatures(media_id: Long, format: String, byte_len: Int,
                               features: Array[Float])

/** Frame-sampling output: chunk counts + a checksum of the first kept
  * frame (stands in for a thumbnail/keyframe artifact). */
final case class MediaFrames(media_id: Long, format: String, n_frames: Int,
                             sampled_frames: Int, first_frame_crc: Long)

/** Resize output: payload downsampled to a bounded size. */
final case class MediaResized(media_id: Long, format: String, resized: Array[Byte])

/** The codec seam: bytes -> fixed-width float features. Implementations
  * are shipped to executors (one instance per partition-task via
  * `mapPartitions`), so they must be [[Serializable]] and should do any
  * heavyweight init lazily per-JVM (e.g. a JNI decoder behind a
  * `@transient lazy val`). A real deployment drops a JPEG/audio decoder
  * in here; NOTHING else in the pipeline changes — schema, batching,
  * downstream joins all depend only on this signature. */
trait MediaCodec extends Serializable {
  def decode(payload: Array[Byte], dim: Int): Array[Float]
}

/** STUB CODEC — stands in for image/audio decode (no codec libraries in
  * this container). Deterministic: folds byte values into `dim` bins and
  * normalizes by payload length.
  *
  * Arithmetic is IEEE-pinned for the mm02 oracle: bin sums are exact
  * integers (< 2^24, exact in float), the divide runs in DOUBLE and
  * narrows to float — both steps any engine reproduces bit-for-bit
  * (a float÷float divide would instead depend on engine promotion
  * rules). It stays the default so oracled queries remain exact. */
object StubCodec extends MediaCodec {
  override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF).toFloat
      i += 1
    }
    val n = math.max(1, payload.length).toDouble
    var j = 0
    while (j < dim) { out(j) = (out(j).toDouble / n).toFloat; j += 1 }
    out
  }
}

/** REAL codec #2 — pure-JVM PNG/JPEG decode via `javax.imageio`
  * (bundled with the JDK, no native libraries): proof the
  * [[MediaCodec]] seam takes a production decoder without touching any
  * operator. Features are a luminance histogram over DECODED PIXELS —
  * trailing bytes after the image stream, chunk reordering, or
  * different compression of the same pixels all yield IDENTICAL
  * features here while changing [[StubCodec]]'s byte-fold, which is
  * exactly the property a content-addressed media pipeline wants (and
  * what the differential spec pins).
  *
  * Same IEEE discipline as the stub: integer bin sums (exact in float
  * below 2^24), one double divide, narrow to float. Payloads that do
  * not decode as images fall back to `fallback` so mixed-modality
  * frames keep flowing — the wav rows of a (png|wav) corpus take the
  * stub path, the png rows take the pixel path.
  *
  * Stateless, so executor shipping is trivial; `ImageIO.read` is
  * called per record on the task thread (codec instances are
  * per-partition, the [[Multimodal.extractFeatures]] contract). */
final class ImageIoCodec(fallback: MediaCodec = StubCodec) extends MediaCodec {
  override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) fallback.decode(payload, dim)
    else {
      val out = new Array[Float](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer BT.601 luma — exact, engine-independent
          val lum = ((rgb >> 16 & 0xFF) * 299 + (rgb >> 8 & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          out((y * w + x) % dim) += lum.toFloat
          x += 1
        }
        y += 1
      }
      val n = math.max(1, w * h).toDouble
      var j = 0
      while (j < dim) { out(j) = (out(j).toDouble / n).toFloat; j += 1 }
      out
    }
  }
}

/** REAL codec #3 — pure-JVM WAV/PCM16 audio decode (RIFF chunk walk,
  * no libraries): features are per-time-bin mean absolute amplitudes
  * over the DECODED SAMPLES. Like [[ImageIoCodec]] for pixels, this
  * reads content, not container bytes: extra metadata chunks (LIST/
  * INFO), chunk reordering, or word-alignment padding around the same
  * samples yield IDENTICAL features while changing the stub's
  * byte-fold. Non-WAV / non-PCM16 payloads fall back, so codecs COMPOSE
  * across modalities: `new ImageIoCodec(new WavPcmCodec)` decodes pixels
  * for image rows, samples for audio rows, and byte-folds the rest —
  * one codec instance, one `mapPartitions` pass, zero operator changes.
  *
  * IEEE discipline: per-bin |sample| sums are exact in LONG, one double
  * divide per bin, narrow to float. */
final class WavPcmCodec(fallback: MediaCodec = StubCodec) extends MediaCodec {
  override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
    val samples = parsePcm16(payload)
    if (samples == null) fallback.decode(payload, dim)
    else {
      val sums = new Array[Long](dim)
      val cnts = new Array[Long](dim)
      val n = math.max(1, samples.length)
      var i = 0
      while (i < samples.length) {
        val b = (i.toLong * dim / n).toInt
        sums(b) += math.abs(samples(i).toLong)
        cnts(b) += 1
        i += 1
      }
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        out(j) = if (cnts(j) == 0) 0f else (sums(j).toDouble / cnts(j)).toFloat
        j += 1
      }
      out
    }
  }

  /** PCM16 samples from a RIFF/WAVE container; null = not decodable
    * (malformed header, compressed audio, truncated chunk) — the
    * caller falls back rather than failing the partition. */
  private def parsePcm16(p: Array[Byte]): Array[Short] =
    try parsePcm16Unsafe(p)
    catch { case _: RuntimeException => null } // corrupt container ⇒ fall back, never fail the task

  private def parsePcm16Unsafe(p: Array[Byte]): Array[Short] = {
    def le32(o: Int): Int =
      (p(o) & 0xFF) | (p(o + 1) & 0xFF) << 8 | (p(o + 2) & 0xFF) << 16 | (p(o + 3) & 0xFF) << 24
    def le16(o: Int): Int = (p(o) & 0xFF) | (p(o + 1) & 0xFF) << 8
    def tag(o: Int): String = new String(p, o, 4, "US-ASCII")
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var off = 12
    var fmtOk = false
    var data: Array[Short] = null
    while (off + 8 <= p.length) {
      val id = tag(off)
      val sz = le32(off + 4)
      // Long math: a crafted size near Int.MaxValue must not wrap the bound negative.
      if (sz < 0 || off.toLong + 8L + sz > p.length) return null
      if (id == "fmt ")
        fmtOk = sz >= 16 && le16(off + 8) == 1 && le16(off + 8 + 14) == 16
      else if (id == "data") {
        val ns = sz / 2
        val arr = new Array[Short](ns)
        var k = 0
        while (k < ns) { arr(k) = le16(off + 8 + k * 2).toShort; k += 1 }
        data = arr
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (fmtOk && data != null) data else null
  }
}

/** Multimodal column plumbing: image/audio/video travel the lake as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs as a batched per-partition stage.
  *
  * The Spark-side plumbing — binary schema, typed Dataset encoders,
  * partition-iterator batching, downstream joinability on `media_id` —
  * is real and tested. ONLY the codec itself is stubbed
  * ([[Multimodal.decodeStub]]): this container has no image/audio
  * libraries, so the stub computes a deterministic byte-histogram
  * "feature" so every downstream stage (similarity over features,
  * format-partitioned stats) is exercised with stable values. A real
  * deployment swaps `decodeStub` for a JNI/Java codec; nothing else
  * changes.
  *
  * Scale posture: `mapPartitions` keeps decode at one codec instance per
  * task (amortized init), the payload never passes through the driver,
  * and features are fixed-width `array<float>` — the same layout the
  * [[Similarity]] operators consume.
  */
object Multimodal {

  /** Deterministic binary corpus derived from the documents table:
    * payload = UTF-8 bytes, format label from the first byte. Stands in
    * for a real media table (the driver lake has no binary fixtures). */
  def mediaCorpus(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(
        array(lit("jpeg"), lit("png"), lit("wav")),
        (ascii(substring(col("text"), 1, 1)) % 3) + 1).as("format"))

  /** Back-compat alias for the default codec ([[StubCodec]]). */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] =
    StubCodec.decode(payload, dim)

  /** Frame sampling (video analog): split the payload into fixed-size
    * chunks ("frames"), keep every k-th, emit counts + a CRC32 of the
    * first kept frame. A real pipeline swaps chunking for container
    * demux; the batching/schema/summary shape is the contract. */
  def sampleFrames(media: DataFrame, frameSize: Int = 32, everyK: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("format"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val frames = r.payload.grouped(frameSize).toArray
          val sampled = frames.indices.collect { case i if i % everyK == 0 => frames(i) }
          val crc = new java.util.zip.CRC32()
          sampled.headOption.foreach(crc.update)
          MediaFrames(r.media_id, r.format, frames.length, sampled.length, crc.getValue)
        }
      }
      .toDF()
  }

  /** Resize (image analog): deterministic stride downsample of the
    * payload to at most `targetBytes`. Real pipelines decode + rescale;
    * the bounded-output contract is what downstream storage relies on. */
  def resize(media: DataFrame, targetBytes: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("format"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val n = r.payload.length
          val out =
            if (n <= targetBytes) r.payload
            else Array.tabulate(targetBytes)(i => r.payload((i.toLong * n / targetBytes).toInt))
          MediaResized(r.media_id, r.format, out)
        }
      }
      .toDF()
  }

  /** Batched decode/feature-extract over the binary column. Pass a real
    * [[MediaCodec]] to productionize; the default stub keeps oracled
    * queries exact. */
  def extractFeatures(media: DataFrame, dim: Int = 8,
                      codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("format"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // one codec instance per partition-task — where a real decoder
        // amortizes its init
        it.map(r => MediaFeatures(r.media_id, r.format, r.payload.length,
          codec.decode(r.payload, dim)))
      }
      .toDF()
  }
}
