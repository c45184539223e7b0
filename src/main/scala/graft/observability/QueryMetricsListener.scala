package graft.observability

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Observability — the Spark analog of the reference's X-Ray subsegments
  * (O12, `CSVIngest.java:45-51,104-111,240-251`): named spans around each
  * query execution with wall-clock and outcome.
  *
  * The reference's flag bug (USE_XRAY read after the traced calls, so
  * tracing only engages on warm re-invocations) is deliberately NOT
  * reproduced: the listener is attached once per session and sees every
  * execution. Spans are kept in a bounded in-memory ring for tests/CLI
  * inspection; production would forward them to a metrics sink.
  */
final case class QuerySpan(name: String, durationNs: Long,
                           succeeded: Boolean, error: Option[String])

final class QueryMetricsListener(maxSpans: Int = 1024) extends QueryExecutionListener {
  private val spans = new ConcurrentLinkedQueue[QuerySpan]()
  // ConcurrentLinkedQueue.size() is O(n); track it in O(1)
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)

  private def record(span: QuerySpan): Unit = {
    spans.add(span)
    if (count.incrementAndGet() > maxSpans) {
      spans.poll()
      count.decrementAndGet()
    }
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(QuerySpan(funcName, durationNs, succeeded = true, None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    record(QuerySpan(funcName, 0L, succeeded = false, Some(exception.toString)))

  def snapshot(): Seq[QuerySpan] = spans.asScala.toSeq

  def clear(): Unit = spans.clear()
}

object QueryMetricsListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: org.apache.spark.sql.SparkSession): QueryMetricsListener = {
    val l = new QueryMetricsListener()
    spark.listenerManager.register(l)
    l
  }
}
