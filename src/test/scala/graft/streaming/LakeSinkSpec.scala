package graft.streaming

import graft.SparkTestSession
import graft.lake.TxnLake
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The append-only lake sink must be exactly-once: a replayed
  * micro-batch (same appId + batchId) is a silent no-op, committed
  * through the transaction marker persisted in the commit record. */
class LakeSinkSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("part", StringType)))

  test("streaming appends land exactly once across restarts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lake_sink")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    def drain(): Unit =
      LakeSink.startAppend(spark.readStream.schema(schema).parquet(in),
        out, "part", "app1", ckpt).awaitTermination()

    Seq((1L, "a"), (2L, "b")).toDF("id", "part").write.mode("append").parquet(in)
    drain()
    assert(TxnLake.read(spark, out).count() === 2)
    // no new data: checkpoint makes the restart a no-op
    drain()
    assert(TxnLake.read(spark, out).count() === 2)
    Seq((3L, "a")).toDF("id", "part").write.mode("append").parquet(in)
    drain()
    assert(TxnLake.read(spark, out)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("a replayed batch id is a silent no-op; new ids append") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_lake_replay").resolve("t").toString
    val b0 = Seq((1L, "a")).toDF("id", "part")
    assert(LakeSink.applyBatch(b0, out, "part", "app", 0L) === true)
    // crash-replay of batch 0: marker already committed
    assert(LakeSink.applyBatch(b0, out, "part", "app", 0L) === false)
    assert(TxnLake.read(spark, out).count() === 1)
    // an OLDER batch id (late replay after progress) is also refused
    assert(LakeSink.applyBatch(Seq((9L, "z")).toDF("id", "part"),
      out, "part", "app", 1L) === true)
    assert(LakeSink.applyBatch(b0, out, "part", "app", 0L) === false)
    assert(TxnLake.read(spark, out).count() === 2)
    // markers are per APPLICATION: another writer's batch 0 lands
    assert(LakeSink.applyBatch(Seq((7L, "c")).toDF("id", "part"),
      out, "part", "other-app", 0L) === true)
    assert(TxnLake.read(spark, out).count() === 3)
    // interleaved ordinary commits don't confuse the marker lookup
    TxnLake.append(spark, out, Seq((8L, "d")).toDF("id", "part"))
    assert(LakeSink.applyBatch(b0, out, "part", "app", 1L) === false)
    assert(TxnLake.lastCommittedTxn(spark, out, "app") === Some(1L))
    assert(TxnLake.lastCommittedTxn(spark, out, "other-app") === Some(0L))
    assert(TxnLake.lastCommittedTxn(spark, out, "nobody") === None)
  }

  test("markers survive the log checkpoint cadence and time travel still works") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_lake_many").resolve("t").toString
    // enough batches to cross a checkpoint boundary (interval 10)
    (0L until 14L).foreach { i =>
      assert(LakeSink.applyBatch(Seq((i, s"p${i % 3}")).toDF("id", "part"),
        out, "part", "app", i) === true)
    }
    assert(LakeSink.applyBatch(Seq((99L, "x")).toDF("id", "part"),
      out, "part", "app", 5L) === false)
    assert(TxnLake.read(spark, out).count() === 14)
    assert(TxnLake.lastCommittedTxn(spark, out, "app") === Some(13L))
    // each batch is one atomic version: history replays exactly
    assert(TxnLake.readVersion(spark, out, 5L).count() === 5) // v0 = empty create
  }
}
