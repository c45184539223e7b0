package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** TYPE WIDENING ([[TxnLake.widenColumn]]): a metadata-only commit
  * changes a column to a wider type; old files keep their narrow
  * physical type and up-convert at scan time, new files are born wide. */
class TypeWideningSpec extends AnyFunSuite with SparkTestSession {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_widen").resolve("t").toString
    TxnLake.create(spark, dir,
      (1 to 8).map(i => (i, i * 1.5f, s"p${i % 2}")).toDF("id", "score", "part")
        .select(col("id").cast("int").as("id"), col("score"), col("part")),
      "part")
    dir
  }

  test("int->long widening is metadata-only; old and new files read as one type") {
    val dir = freshTable()
    val before = TxnLake.resolve(spark, dir).get
    TxnLake.widenColumn(spark, dir, "id", LongType)
    val after = TxnLake.resolve(spark, dir).get
    assert(after.files.map(_.path) === before.files.map(_.path),
      "widening must not touch a single data file")
    assert(TxnLake.read(spark, dir).schema("id").dataType === LongType)
    // post-widen appends are born wide; both eras aggregate together
    import spark.implicits._
    TxnLake.append(spark, dir,
      Seq((3000000000L, 9.5f, "p0")).toDF("id", "score", "part"))
    val got = TxnLake.read(spark, dir).agg(sum(col("id"))).collect().head.getLong(0)
    assert(got === (1 to 8).map(_.toLong).sum + 3000000000L)
    // time travel serves the narrow era unchanged
    assert(TxnLake.readVersion(spark, dir, 0L).schema("id").dataType === IntegerType)
  }

  test("float->double and int->decimal widen; lossy changes fail loudly") {
    val dir = freshTable()
    TxnLake.widenColumn(spark, dir, "score", DoubleType)
    assert(TxnLake.read(spark, dir).schema("score").dataType === DoubleType)
    // float 1.5 is exactly representable: values survive the promotion
    assert(TxnLake.read(spark, dir).filter(col("id") === 1)
      .select("score").collect().head.getDouble(0) === 1.5)
    TxnLake.widenColumn(spark, dir, "id", DecimalType(12, 0))
    assert(TxnLake.read(spark, dir).count() === 8)
    intercept[IllegalArgumentException] {
      TxnLake.widenColumn(spark, dir, "score", FloatType) // narrowing
    }
    intercept[IllegalArgumentException] {
      TxnLake.widenColumn(spark, dir, "id", DecimalType(5, 0)) // too small for int
    }
    intercept[IllegalArgumentException] {
      TxnLake.widenColumn(spark, dir, "nope", LongType) // unknown column
    }
  }

  test("partition column refuses widening; renamed columns widen by logical name") {
    val dir = freshTable()
    intercept[IllegalArgumentException] {
      TxnLake.widenColumn(spark, dir, "part", LongType)
    }
    TxnLake.renameColumn(spark, dir, "id", "ident")
    TxnLake.widenColumn(spark, dir, "ident", LongType)
    val df = TxnLake.read(spark, dir)
    assert(df.schema("ident").dataType === LongType)
    assert(df.agg(sum(col("ident"))).collect().head.getLong(0) === 36L)
  }

  test("zone maps and merge-on-read survive a widen") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_widen_zm").resolve("t").toString
    TxnLake.create(spark, dir,
      (1 to 8).map(i => (i, s"p${i % 2}")).toDF("n", "part")
        .select(col("n").cast("int").as("n"), col("part")),
      "part", statsCol = Some("n"))
    TxnLake.widenColumn(spark, dir, "n", LongType)
    TxnLake.deleteWhere(spark, dir, col("n") === 3L)
    assert(TxnLake.read(spark, dir).agg(sum(col("n"))).collect().head.getLong(0) === 33L)
    // range read still prunes off the (double-typed) zone maps
    assert(TxnLake.readRange(spark, dir, 5.0, 8.0).count() === 4)
  }
}
