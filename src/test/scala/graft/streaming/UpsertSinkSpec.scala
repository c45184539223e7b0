package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The upsert sink must be idempotent under replay and must merge, not
  * append: overlapping keys update in place, re-processing adds nothing. */
class UpsertSinkSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType)))

  test("foreachBatch upsert sink merges keys and survives replay without duplicates") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_upsert_sink")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    def drain(): Unit = {
      val q = UpsertSink.start(
        spark.readStream.schema(schema).parquet(in), out, "id", ckpt)
      q.awaitTermination()
    }

    // batch 1: initial load
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.mode("append").parquet(in)
    drain()
    val after1 = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(after1.toSeq === Seq((1L, "a"), (2L, "b")))

    // batch 2: overlap (2 updated) + new key
    Seq((2L, "b2"), (3L, "c")).toDF("id", "payload")
      .write.mode("append").parquet(in)
    drain()
    val after2 = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(after2.toSeq === Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    // replay with nothing new: checkpoint makes it a no-op
    drain()
    val after3 = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(after3.toSeq === after2.toSeq)

    // duplicate key WITHIN one batch: deterministic winner (max payload),
    // not an arbitrary dropDuplicates pick
    Seq((4L, "d1"), (4L, "d9"), (4L, "d5")).toDF("id", "payload")
      .write.mode("append").parquet(in)
    drain()
    val after4 = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1).toMap
    assert(after4(4L) === "d9")
  }
}
