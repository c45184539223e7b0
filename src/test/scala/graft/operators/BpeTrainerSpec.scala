package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LEARNED BPE ([[BpeTrainer]]): corpus-driven merge-table training —
  * one keyed agg per round over the distinct-word table, arg-max as
  * the only driver row, deterministic tie-breaks. */
class BpeTrainerSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def words(pairs: (String, Long)*) = pairs.toDF("word", "cnt")

  test("merges the most frequent adjacent pair each round, by hand-check") {
    // classic Sennrich toy: low×5, lower×2, newest×6, widest×3
    val w = words("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = BpeTrainer.train(w, rounds = 3)
    // round 1: 'es' (newest 6 + widest 3 = 9), then 'est' (9), then
    // 'lo' (low 5 + lower 2 = 7)
    assert(m.map(x => (x.round, x.left, x.right, x.count)) ===
      Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("ties break on (count DESC, left ASC, right ASC) — deterministic") {
    // "ab"×3 and "cd"×3: pairs (a,b)=3, (c,d)=3 — (a,b) must win
    val m = BpeTrainer.train(words("ab" -> 3L, "cd" -> 3L), rounds = 1)
    assert(m === Seq(BpeTrainer.Merge(1, "a", "b", 3L)))
  }

  test("training stops early when the vocabulary fully merges") {
    val m = BpeTrainer.train(words("ab" -> 2L), rounds = 10)
    assert(m === Seq(BpeTrainer.Merge(1, "a", "b", 2L)))
  }

  test("one round = ONE keyed shuffle; vocabulary never hits the driver") {
    // repartition(3) models distributed input (a 1-partition local
    // relation would let Spark elide the exchange outright); AQE off so
    // the static plan shows its exchanges directly
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cur = BpeTrainer.symbolized(
        words("low" -> 5L, "newest" -> 6L).repartition(3))
      val plan = BpeTrainer.pairCounts(cur).queryExecution.executedPlan
      // exactly the input repartition + ONE keyed-agg exchange — and a
      // partial aggregate below it (map-side combine before the wire)
      val shuffles = plan.collect { case e: Exchange => e }
      assert(shuffles.size === 2,
        s"pair counting must add exactly one keyed-agg shuffle, got:\n$plan")
      val aggs = plan.collect {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
      }
      assert(aggs.size === 2, s"partial + final aggregate expected, got:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("consecutive occurrences of a pair all merge in one round") {
    // 'banana' → b a n a n a: pairs (b,a)=1, (a,n)=2, (n,a)=2 — (a,n)
    // wins the tie on left ASC. A single-space representation would
    // let the two ' a n ' matches share their middle delimiter and
    // merge only the FIRST (b an a n a — 5 symbols); the per-symbol
    // spacing merges both, like Sennrich's round does
    val m = BpeTrainer.train(words("banana" -> 1L), rounds = 1)
    assert(m === Seq(BpeTrainer.Merge(1, "a", "n", 2L)))
    val n = Seq("banana").toDF("w")
      .select(BpeTrainer.tokenCount(col("w"), m).as("n"))
      .head().getInt(0)
    assert(n === 4, "b an an a — both occurrences merged in one round")
    // round 2 sees the post-merge vocabulary b an an a: all pairs are
    // count 1 and (an,a) wins the (left, right) tie-break
    val m2 = BpeTrainer.train(words("banana" -> 1L), rounds = 2)
    assert(m2(1) === BpeTrainer.Merge(2, "an", "a", 1L))
  }

  test("tokenCount applies learned merges in order, row-locally") {
    val m = Seq(BpeTrainer.Merge(1, "e", "s", 9L),
      BpeTrainer.Merge(2, "es", "t", 9L))
    val got = Seq("newest", "low").toDF("w")
      .select(BpeTrainer.tokenCount(col("w"), m).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // n-e-w-est = 4 symbols; l-o-w untouched = 3
    assert(got === Seq(4, 3))
  }
}
