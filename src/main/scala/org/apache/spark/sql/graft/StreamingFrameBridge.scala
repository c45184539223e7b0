package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** The one `private[sql]` call a V1 streaming `Source` cannot avoid:
  * `Source.getBatch` must return a DataFrame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * way to mint one from an arbitrary batch plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * The public Kafka connector sits inside `o.a.s.sql.kafka010` for
  * exactly this reason; this bridge is graft's equivalent — one method,
  * nothing else reaches into Spark internals. */
object StreamingFrameBridge {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The sink-side mirror: `Sink.addBatch` receives a DataFrame riding
    * the micro-batch's IncrementalExecution — re-planning it (any new
    * Dataset op that re-analyzes the streaming plan) would re-execute
    * sources and lose stateful operators' batch-pinned state reads.
    * Pinning the already-planned RDD under a fresh batch plan is the
    * standard sink recipe (Delta's `DeltaSink` wraps
    * `data.queryExecution.toRdd` in a `LogicalRDD` the same way). */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
