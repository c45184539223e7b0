package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private def eval1(text: String, f: Column => Column): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(f(col("t")).as("v")).collect()(0).get(0)
  }

  test("tokenCount / avgTokenLen") {
    assert(eval1("a bb ccc", TextFunctions.tokenCount) === 3)
    assert(eval1("a bb ccc", TextFunctions.avgTokenLen) === 2.0)
  }

  test("stopword ratio counts marker tokens only") {
    assert(eval1("the cat a dog", c => TextFunctions.stopwordRatio(c)) === 0.5)
  }

  test("shingles: width 3 over 4 tokens gives 2 shingles; short doc gives none") {
    assert(eval1("a b c d", c => TextFunctions.shingles(c, 3)) ===
      Seq("a b c", "b c d"))
    assert(eval1("a b", c => TextFunctions.shingles(c, 3)) === Seq())
  }

  test("langId picks the marker set with most hits, first-wins ties") {
    assert(eval1("the a of cat", TextFunctions.langId) === "en")
    assert(eval1("data table row column cat", TextFunctions.langId) === "db")
    assert(eval1("query join filter sort sort", TextFunctions.langId) === "qy")
    // zero hits everywhere -> ties -> first label wins
    assert(eval1("zzz yyy", TextFunctions.langId) === "en")
  }

  test("fingerprint is deterministic, order-sensitive, and bounded") {
    val a = eval1("a b c", TextFunctions.fingerprint).asInstanceOf[Long]
    val b = eval1("a b c", TextFunctions.fingerprint).asInstanceOf[Long]
    val c = eval1("c b a", TextFunctions.fingerprint).asInstanceOf[Long]
    assert(a === b)
    assert(a !== c, "fingerprint must be order-sensitive")
    assert(a >= 0 && a < 1000000007L)
  }

  test("quality score stays in [0,1]") {
    Seq("a", "the the the", ("tok " * 200).trim).foreach { t =>
      val q = eval1(t, TextFunctions.qualityScore).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"quality($t) = $q")
    }
  }
}
