package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches the most recent right row, <= boundary inclusive, unmatched left drops") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, quote_id)
      (1L, ts("2024-01-01 00:00:05"), 900L),
      (1L, ts("2024-01-01 00:00:18"), 901L),
      (2L, ts("2024-01-01 00:00:99".replace("99", "59")), 902L)
    ).toDF("k", "qts", "quote_id")
    val trades = Seq( // (key, ts, trade_id)
      (1L, ts("2024-01-01 00:00:10"), 100L),
      (1L, ts("2024-01-01 00:00:18"), 101L), // equal ts -> matches 901
      (2L, ts("2024-01-01 00:00:15"), 102L)  // before any quote -> drops
    ).toDF("k", "tts", "trade_id")

    val got = AsOfJoin.asOf(trades, quotes, "k", "tts", "qts",
        leftPayload = Seq("trade_id"), rightPayload = Seq("quote_id"))
      .select("trade_id", "quote_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 900L), (101L, 901L)))
  }

  test("randomized differential: union+window equals the naive range-join formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val l = (1 to 400).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "lts", "lid")
    // unique rts by construction (tie-break on equal rts is documented as
    // arbitrary, so the differential only covers the unique case)
    val r = (1 to 400).map(i => (rnd.nextInt(8).toLong, i * 3L, 1000L + i))
      .toDF("k", "rts", "rid")
    // naive: per left row, right row with max rts <= lts (unique rts per (k,rid) pair set;
    // ties on rts are broken identically by taking max rid among max rts)
    val naive = l.as("l").join(r.as("r"),
        org.apache.spark.sql.functions.col("l.k") === org.apache.spark.sql.functions.col("r.k") &&
          $"rts" <= $"lts")
      .groupBy($"lid")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"rts", $"rid")).as("m"))
      .select($"lid", $"m.rid".as("rid"))
    val got = AsOfJoin.asOf(l, r, "k", "lts", "rts", Seq("lid"), Seq("rid"))
      .select("lid", "rid")
    // compare only rows where the right ts is unique at the match point
    // (AsOfJoin documents arbitrary tie-break); this seed has no (k,rts) dups
    val dupTs = r.groupBy("k", "rts").count().filter($"count" > 1).count()
    assert(dupTs === 0, "seed produced (k,rts) duplicates; change seed")
    assert(got.count() === naive.count())
    assert(got.exceptAll(naive).count() === 0)
  }

  test("plan shape: one shuffle on the key, no cartesian/range join") {
    import spark.implicits._
    val l = spark.range(0, 1000).select(($"id" % 10).as("k"), $"id".as("lts"), $"id".as("lid"))
    val r = spark.range(0, 1000).select(($"id" % 10).as("k"), $"id".as("rts"), $"id".as("rid"))
    val plan = AsOfJoin.asOf(l, r, "k", "lts", "rts", Seq("lid"), Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"as-of should be union+window, not a join\n$plan")
  }
}
