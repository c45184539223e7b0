package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang")).cache()

  test("hashSample is deterministic and close to the requested rate") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a === b, "same rate must keep the same ids on every run")
    val total = docs.count().toDouble
    assert(math.abs(a.size / total - 0.3) < 0.1,
      s"sampled ${a.size}/$total, expected ~30%")
    // rate monotonicity: a smaller rate keeps a SUBSET (nested samples)
    val smaller = Sampling.hashSample(docs, "doc_id", 0.1).collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(a), "samples must be nested as the rate grows")
  }

  test("hashSample boundary rates keep nothing / everything") {
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() === 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() === docs.count())
  }

  test("stratifiedSample applies per-stratum rates and drops unlisted strata") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(byLang.getOrElse("en", 0L) === enTotal, "rate 1.0 keeps every row")
    assert(!byLang.contains("de"), "rate 0.0 keeps none")
    assert(byLang.keySet === Set("en"), "unlisted strata are dropped")
  }

  test("assignSplit partitions every row exactly once with stable membership") {
    val split = Sampling.assignSplit(docs, "doc_id", valPct = 0.1, testPct = 0.1)
    assert(split.count() === docs.count())
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum === docs.count())
    val total = docs.count().toDouble
    assert(counts("train") / total > 0.7, s"train share too small: $counts")
    // membership is a pure function of the id: re-assignment identical
    val again = Sampling.assignSplit(docs, "doc_id", valPct = 0.1, testPct = 0.1)
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() === 0)
  }
}
