package graft.observability

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

class ObservabilitySpec extends AnyFunSuite with SparkTestSession {

  test("listener records named spans with durations for executed queries") {
    val l = QueryMetricsListener.attach(spark)
    try {
      Tables.nation(spark, sf).count()
      // listener callbacks are async — poll for delivery
      val deadline = System.nanoTime() + 10000000000L
      while (l.snapshot().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val spans = l.snapshot()
      assert(spans.nonEmpty)
      assert(spans.exists(s => s.name == "count" && s.succeeded && s.durationNs > 0),
        s"spans: $spans")
    } finally spark.listenerManager.unregister(l)
  }

  test("span ring is bounded") {
    val l = new QueryMetricsListener(maxSpans = 3)
    (1 to 10).foreach(i => l.onSuccess(s"q$i", null, i.toLong))
    assert(l.snapshot().size === 3)
    assert(l.snapshot().map(_.name) === Seq("q8", "q9", "q10"))
  }
}
