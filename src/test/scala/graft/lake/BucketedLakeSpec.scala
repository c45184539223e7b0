package graft.lake

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The point of bucketing is the ABSENCE of Exchange in the join plan —
  * that's what this spec pins. */
class BucketedLakeSpec extends AnyFunSuite with SparkTestSession {

  test("joining two same-bucketed tables plans with zero Exchange and matches the plain join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    BucketedLake.writeBucketed(li, "li_bucketed", "l_orderkey", 8, sortKey = Some("l_orderkey"))
    BucketedLake.writeBucketed(o, "o_bucketed", "o_orderkey", 8, sortKey = Some("o_orderkey"))

    // disable auto-broadcast: at test scale the planner would broadcast
    // the small side (and rightly skip bucketing); the scenario under
    // test is two big sides, where bucketing is the shuffle-killer.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedLake.cocolocatedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges === 0, s"expected shuffle-free bucketed join, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed scan still prunes columns and pushes filters") {
    val one = spark.table("li_bucketed").select("l_orderkey", "l_quantity")
      .where("l_quantity > 45")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), plan)
  }
}
