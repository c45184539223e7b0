package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // (id, key, 5 tokens each except doc 4 which has 2)
  private lazy val docs = Seq(
    (1L, "en", "a b c d e"),
    (2L, "en", "f g h i j"),
    (3L, "en", "k l m n o"),
    (4L, "en", "p q"),
    (10L, "de", "x y z w v")).toDF("doc_id", "lang", "text")

  test("bin is the budget-quotient of tokens preceding the doc in its stream") {
    val out = Packing.assignBins(docs, "doc_id", "text", "lang", budget = 7L)
      .select("doc_id", "n_tokens", "tok_start", "bin")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((5L, 0L, 0L)), "first doc starts bin 0")
    assert(out(2L) === ((5L, 5L, 0L)), "doc 2 STARTS inside bin 0 (straddles into bin 1)")
    assert(out(3L) === ((5L, 10L, 1L)))
    assert(out(4L) === ((2L, 15L, 2L)))
    assert(out(10L) === ((5L, 0L, 0L)), "each key is its own stream")
  }

  test("assignment is deterministic across recomputation") {
    val a = Packing.assignBins(docs, "doc_id", "text", "lang", 7L)
      .select("doc_id", "bin")
    val b = Packing.assignBins(docs.repartition(8), "doc_id", "text", "lang", 7L)
      .select("doc_id", "bin")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0,
      "bins must not depend on input partitioning")
  }

  test("every bin except the last per key starts within budget of the previous") {
    val out = Packing.assignBins(docs, "doc_id", "text", "lang", 7L)
    // bins are dense: max bin index == floor(total_prefix/budget) of the last doc
    val en = out.filter(col("lang") === "en").agg(max("bin"), sum("n_tokens")).head()
    assert(en.getLong(0) === 2L && en.getLong(1) === 17L)
  }
}
