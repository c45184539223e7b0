package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Makes the 100×-scale skew story MEASURED instead of asserted
  * (VERDICT r8 #7): on a deliberately skewed join key, AQE's
  * OptimizeSkewedJoin must actually split the hot partition — the final
  * adaptive plan carries `skew=true` on the join node. The manual salted
  * fallback ([[graft.operators.SkewJoin]]) stays for the cases AQE
  * declines (e.g. a skewed side that must also preserve partitioning);
  * this probe pins that the AUTOMATIC path engages when we rely on it.
  *
  * Thresholds are lowered to make sf-test-scale bytes register as skew;
  * the trigger condition (partition > max(threshold, factor × median))
  * is the same one a 1000-executor cluster evaluates per shuffle.
  */
class SkewProbeSpec extends AnyFunSuite with SparkTestSession {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a deliberately skewed sort-merge join (skew=true in the final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768") {
      import spark.implicits._
      // 40k of 60k rows land on key 0; the payload is an md5 so shuffle
      // compression can't shrink the hot partition below the threshold
      val left = spark.range(0, 60000)
        .select(
          when($"id" < 40000, lit(0L))
            .otherwise(pmod($"id", lit(97)).cast("long")).as("k"),
          md5($"id".cast("string")).as("pad"))
      val right = spark.range(0, 97).select($"id".as("k"), lit("dim").as("v"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's QueryExecution — `.count()` would build
      // a separate aggregate plan and leave `joined`'s adaptive plan
      // unfinalized (isFinalPlan=false, no skew rewrite to observe)
      assert(joined.collect().length === 60000)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"AQE did not rewrite the skewed join; final plan:\n$planStr")
    }
  }

  test("without AQE skew handling the same join keeps one hot partition (control)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      val left = spark.range(0, 60000)
        .select(
          when($"id" < 40000, lit(0L))
            .otherwise(pmod($"id", lit(97)).cast("long")).as("k"),
          md5($"id".cast("string")).as("pad"))
      val right = spark.range(0, 97).select($"id".as("k"), lit("dim").as("v"))
      val joined = left.join(right, "k")
      assert(joined.count() === 60000)
      assert(!joined.queryExecution.executedPlan.toString.contains("skew=true"))
    }
  }
}
