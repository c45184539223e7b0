package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SCD TYPE 2 ([[Scd2]]): every change closes the open row and opens a
  * new one atomically; unchanged updates are no-ops; as-of reconstructs
  * any load's view from the data alone. */
class Scd2Spec extends AnyFunSuite with SparkTestSession {

  private def freshDim(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_scd2").resolve("dim").toString
    Scd2.init(spark,
      dir,
      Seq((1L, "gold", 10.0), (2L, "silver", 20.0), (3L, "bronze", 30.0))
        .toDF("cust", "tier", "bal"),
      "cust", version = 1L, buckets = 4)
    dir
  }

  test("a changed attribute closes the open row and opens a new one, atomically") {
    import spark.implicits._
    val dir = freshDim()
    val n = Scd2.apply(spark, dir,
      Seq((1L, "platinum", 10.0), (2L, "silver", 20.0)).toDF("cust", "tier", "bal"),
      "cust", version = 2L)
    assert(n === 1L, "the unchanged key must be a no-op")
    val rows = TxnLake.read(spark, dir)
      .select("cust", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(rows === Set(
      (1L, "gold", 1L, 2L, false),
      (1L, "platinum", 2L, Scd2.OpenVersion, true),
      (2L, "silver", 1L, Scd2.OpenVersion, true),
      (3L, "bronze", 1L, Scd2.OpenVersion, true)))
    // exactly one open row per key, always
    val open = Scd2.current(spark, dir).groupBy("cust").count()
      .select(max(col("count"))).collect().head.getLong(0)
    assert(open === 1L)
  }

  test("new keys start chains; as-of reconstructs each load's view") {
    import spark.implicits._
    val dir = freshDim()
    Scd2.apply(spark, dir, Seq((1L, "platinum", 10.0), (9L, "new", 0.0))
      .toDF("cust", "tier", "bal"), "cust", 2L)
    Scd2.apply(spark, dir, Seq((1L, "diamond", 10.0))
      .toDF("cust", "tier", "bal"), "cust", 3L)
    def tierOf(v: Long) = Scd2.asOf(spark, dir, v).filter(col("cust") === 1L)
      .select("tier").collect().map(_.getString(0)).toSeq
    assert(tierOf(1L) === Seq("gold"))
    assert(tierOf(2L) === Seq("platinum"))
    assert(tierOf(3L) === Seq("diamond"))
    assert(Scd2.asOf(spark, dir, 1L).count() === 3)
    assert(Scd2.asOf(spark, dir, 2L).count() === 4)
    assert(Scd2.current(spark, dir).filter(col("cust") === 1L)
      .select("tier").collect().head.getString(0) === "diamond")
  }

  test("fact as-of join picks the era the fact was observed under") {
    import spark.implicits._
    val dir = freshDim()
    Scd2.apply(spark, dir, Seq((1L, "platinum", 10.0))
      .toDF("cust", "tier", "bal"), "cust", 2L)
    val facts = Seq((1L, 1L, 100.0), (1L, 2L, 200.0))
      .toDF("cust", "load", "amount")
    val dim = TxnLake.read(spark, dir).select("cust", "tier", "valid_from", "valid_to")
    val got = Scd2.joinAsOf(facts, dim, "cust", facts("load"))
      .select("load", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "gold"), (2L, "platinum")))
  }

  test("null attributes compare null-safely; chains co-locate by bucket") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_scd2n").resolve("dim").toString
    Scd2.init(spark, dir,
      Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "attr"),
      "k", 1L, buckets = 4)
    // null -> null is NOT a change; null -> value is
    assert(Scd2.apply(spark, dir,
      Seq((1L, Option.empty[String])).toDF("k", "attr"), "k", 2L) === 0L)
    assert(Scd2.apply(spark, dir,
      Seq((1L, Some("y"))).toDF("k", "attr"), "k", 3L) === 1L)
    val buckets = TxnLake.read(spark, dir).filter(col("k") === 1L)
      .select("scd_bucket").distinct().count()
    assert(buckets === 1L, "a key's chain must live in one bucket")
  }

  test("a non-key-unique batch is rejected before any commit") {
    import spark.implicits._
    val dir = freshDim()
    // two differing rows for cust=1 would mint colliding `1:2`
    // surrogates and leave the key with two open rows
    val e = intercept[IllegalArgumentException] {
      Scd2.apply(spark, dir,
        Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("cust", "tier", "bal"),
        "cust", version = 2L)
    }
    assert(e.getMessage.contains("key-unique"))
    intercept[IllegalArgumentException] {
      Scd2.apply(spark, dir,
        Seq((Option.empty[Long], "a", 1.0)).toDF("cust", "tier", "bal"),
        "cust", version = 2L)
    }
    // invariant intact: one open row per key, nothing committed
    assert(Scd2.current(spark, dir).count() === 3L)
  }

  test("byte-identical duplicate rows collapse instead of tripping the guard") {
    import spark.implicits._
    val dir = freshDim()
    // the union-assembled case the docstring promises to accept: two
    // exact copies of one changed row are ONE logical change
    assert(Scd2.apply(spark, dir,
      Seq((1L, "gold2", 5.0), (1L, "gold2", 5.0)).toDF("cust", "tier", "bal"),
      "cust", version = 2L) === 1L)
    val open = Scd2.current(spark, dir).filter(col("cust") === 1L)
    assert(open.count() === 1L)
    assert(open.select("tier").head.getString(0) === "gold2")
  }

  test("an out-of-order (non-advancing) load version is rejected") {
    import spark.implicits._
    val dir = freshDim()
    assert(Scd2.apply(spark, dir,
      Seq((1L, "platinum", 10.0)).toDF("cust", "tier", "bal"),
      "cust", version = 5L) === 1L)
    // replaying version 5 (or an earlier 3) against the same key would
    // seal an interval at or before its own start — overlap
    val e = intercept[IllegalArgumentException] {
      Scd2.apply(spark, dir,
        Seq((1L, "diamond", 10.0)).toDF("cust", "tier", "bal"),
        "cust", version = 5L)
    }
    assert(e.getMessage.contains("out-of-order"))
    // an UNTOUCHED key does not gate: version 3 < 5 is fine for cust=2
    assert(Scd2.apply(spark, dir,
      Seq((2L, "gold", 20.0)).toDF("cust", "tier", "bal"),
      "cust", version = 3L) === 1L)
    val open = Scd2.current(spark, dir).filter(col("cust") === 1L)
    assert(open.count() === 1L)
    assert(open.select("tier").head.getString(0) === "platinum")
  }
}
