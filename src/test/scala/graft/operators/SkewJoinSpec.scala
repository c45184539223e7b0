package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkTestSession {

  test("salted join equals plain join on heavily skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (2L, "a"), (30L, "b"), (40000L, "absent-in-big"))
      .toDF("k", "label")

    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)

    assert(salted.count() === plain.count())
    val diff = salted.select("k", "payload", "label")
      .exceptAll(plain.select("k", "payload", "label")).count()
    assert(diff === 0)
  }

  test("salt actually spreads the hot key across partitions") {
    import spark.implicits._
    val big = spark.range(0, 1000).select(lit(1L).as("k"), col("id").as("payload"))
    val small = Seq((1L, "x")).toDF("k", "label")
    val parts = SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(parts.count(_ > 0) > 1, s"all rows in one partition: ${parts.toSeq}")
  }
}
