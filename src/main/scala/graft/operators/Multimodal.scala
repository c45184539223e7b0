package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed multimodal record: opaque binary payload + typed metadata. */
final case class MediaRecord(media_id: Long, payload: Array[Byte], format: String)

/** Decoded feature row produced by the (stubbed) codec stage. */
final case class MediaFeatures(media_id: Long, format: String, byte_len: Int,
                               features: Array[Float])

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

  /** STUB CODEC — stands in for image/audio decode (no codec libraries in
    * this container). Deterministic: folds byte values into `dim` bins
    * and normalizes by payload length. Replace with a real decoder to
    * productionize; the signature (bytes -> fixed-width float features)
    * is the contract the pipeline depends on. */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF).toFloat
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** Batched decode/feature-extract over the binary column. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("format"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // one "codec" per partition — where a real decoder would init once
        it.map(r => MediaFeatures(r.media_id, r.format, r.payload.length,
          decodeStub(r.payload, dim)))
      }
      .toDF()
  }
}
