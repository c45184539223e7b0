package graft.streaming

import graft.ingest.{IngestMode, LineMassager}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous ingest — the Spark analog of the reference's event-driven
  * trigger (`CSVIngest.java:28,211-225`: one Lambda invocation per S3
  * object arrival).
  *
  * Structured Streaming's file source IS that operator done right: the
  * checkpointed file index discovers each new object under the raw zone
  * exactly once, `input_file_name()` carries per-file lineage (the
  * reference's srcKey), and the massage pipeline is the same Column
  * expression the batch path uses — one definition, two execution modes.
  *
  * Scale posture: file-source listing is incremental (maxFilesPerTrigger
  * throttles burst arrivals); the pipeline is narrow (no shuffle), so a
  * 1000-executor cluster rides arrival parallelism with zero exchanges.
  */
object IngestStream {

  /** Start the raw→processed massage stream. `Trigger.AvailableNow` for
    * catch-up-and-stop (used by tests); pass a ProcessingTime trigger for
    * continuous tailing. */
  def start(spark: SparkSession, rawDir: String, outDir: String,
            checkpointDir: String,
            mode: IngestMode = IngestMode.Actual,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader0 = spark.readStream
    val reader = maxFilesPerTrigger.fold(reader0)(n => reader0.option("maxFilesPerTrigger", n.toString))
    val raw = reader.text(rawDir)
    raw
      .select(
        LineMassager.massage(col("value"), mode).as("value"),
        input_file_name().as("source_file"))
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
