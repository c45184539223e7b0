package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test: the range-partitioned two-pass rank must equal the
  * single-task `Window.orderBy` form bit-for-bit, for row_number and for
  * every ntile bucket shape (exact-divisor, remainder, n > rows). */
class GlobalRankSpec extends AnyFunSuite with SparkTestSession {

  private def sample = {
    import spark.implicits._
    // deterministic, shuffled keys with duplicates on `v` (tiebreak on id)
    (0 until 5000).map(i => ((i * 2654435761L) % 997, i.toLong)).toDF("v", "id")
  }

  test("withGlobalRank == global window row_number, across partition counts") {
    val keys = Seq(col("v"), col("id"))
    val expected = sample.withColumn("expect",
      row_number().over(Window.orderBy(keys: _*)).cast("long"))
    for (parts <- Seq(1, 4, 13)) {
      val got = GlobalRank.withGlobalRank(sample, keys, "rnk", parts)
      val joined = got.join(expected, Seq("v", "id"))
      assert(joined.filter(col("rnk") =!= col("expect")).count() === 0,
        s"rank mismatch at numPartitions=$parts")
      assert(joined.count() === 5000)
    }
  }

  test("withGlobalNtile matches window ntile for even, ragged, and tiny buckets") {
    val keys = Seq(col("v"), col("id"))
    for (n <- Seq(4, 7, 5000, 6000)) {
      val expected = sample.withColumn("expect",
        ntile(n).over(Window.orderBy(keys: _*)))
      val got = GlobalRank.withGlobalNtile(sample, keys, n, "rnk", "tile")
      val joined = got.join(expected, Seq("v", "id"))
      assert(joined.filter(col("tile") =!= col("expect")).count() === 0,
        s"ntile mismatch at n=$n")
    }
  }

  test("withGlobalRankTies == global window rank(), tie groups intact across partitions") {
    // sort by v ONLY — heavy ties (5000 rows over 997 values) that must
    // never straddle a range-partition boundary
    val keys = Seq(col("v"))
    val expected = sample.withColumn("expect",
      rank().over(Window.orderBy(keys: _*)).cast("long"))
    for (parts <- Seq(4, 13)) {
      val got = GlobalRank.withGlobalRankTies(sample, keys, "rnk", parts)
      val joined = got.join(expected, Seq("v", "id"))
      assert(joined.filter(col("rnk") =!= col("expect")).count() === 0,
        s"rank-with-ties mismatch at numPartitions=$parts")
    }
  }

  test("two-pass plan reads the pinned range shuffle; no single-partition exchange over data") {
    val df = GlobalRank.withGlobalRank(sample, Seq(col("v"), col("id")), "rnk", 8)
    val plan = df.queryExecution.executedPlan.toString()
    // the range shuffle is materialized ONCE behind an RDD scan (so the
    // ranked and offsets branches cannot see different partitionings);
    // downstream only hash exchanges on __pid remain
    assert(plan.contains("ExistingRDD"),
      s"expected the pinned range-shuffle scan in:\n$plan")
    // (a SinglePartition exchange still appears for the metadata-scale
    // offsets prefix-sum — #partitions rows, not data)
  }

  test("ntile + percent_rank derived from the two-pass rank == stock global window (q20 shape)") {
    // the idiom-contrast control for the registered q20: the single-task
    // Window.orderBy form is the semantics reference, the distributed
    // form is what ships
    val keys = Seq(col("v"), col("id"))
    val w = Window.orderBy(keys: _*)
    val expected = sample.select(col("id"),
      ntile(4).over(w).as("e_tile"),
      round(percent_rank().over(w), 6).as("e_pr"))
    val total = sample.count()
    val got = GlobalRank.withGlobalNtile(sample, keys, 4,
        rankCol = "rnk", tileCol = "tile", keepTotalAs = Some("tot"))
      .select(col("id"), col("tile"),
        round(when(col("tot") === 1, lit(0.0))
          .otherwise((col("rnk") - 1).cast("double") /
            (col("tot") - 1).cast("double")), 6).as("pr"))
    val joined = got.join(expected, Seq("id"))
    assert(joined.count() === total)
    assert(joined.filter(col("tile") =!= col("e_tile") ||
      col("pr") =!= col("e_pr")).count() === 0)
  }
}
