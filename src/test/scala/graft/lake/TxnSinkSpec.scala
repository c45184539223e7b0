package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TxnSink]] — `df.writeStream.format("graft-txn")` (the Delta-parity
  * streaming SINK): per-batch marker-checked commits, Append and
  * Complete output modes, first-batch create, restart with no
  * duplicates, Update-mode refusal. */
class TxnSinkSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private var n = 0
  private def fresh(tag: String): String = {
    n += 1
    Files.createTempDirectory(s"graft_tsink_$tag").toString
  }

  /** A 3-file parquet input dir — with maxFilesPerTrigger=1 the stream
    * drains it in three micro-batches, so batch ids 0..2 all commit. */
  private def mkInput(rows: Range): String = {
    val in = fresh("in") + "/data"
    rows.map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
      .repartition(3).write.parquet(in)
    in
  }

  private def stream(in: String): DataFrame =
    spark.readStream.schema("id BIGINT, part STRING, v BIGINT")
      .option("maxFilesPerTrigger", "1").parquet(in)

  test("append mode: multi-batch drain lands every row exactly once") {
    val in = mkInput(1 to 30)
    val tbl = fresh("tbl")
    val ckpt = fresh("ck")
    stream(in).writeStream.format("graft-txn").partitionBy("part")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    val got = TxnLake.read(spark, tbl)
    assert(got.count() === 30L)
    assert(got.agg(sum("v")).as[Long].head() === (1 to 30).map(_ * 2L).sum)
    // multi-batch: at least 3 data commits + the empty create
    assert(TxnLake.currentVersion(spark, tbl) >= 3L)
  }

  test("restart from the same checkpoint re-delivers nothing; new files flow") {
    val inRoot = fresh("in2")
    val in = inRoot + "/data"
    (1 to 10).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
      .coalesce(1).write.mode("append").parquet(in)
    val tbl = fresh("tbl")
    val ckpt = fresh("ck")
    def run(): Unit =
      stream(in).writeStream.format("graft-txn").option("partCol", "part")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    run()
    assert(TxnLake.read(spark, tbl).count() === 10L)
    run() // no new input: restart must append nothing
    assert(TxnLake.read(spark, tbl).count() === 10L)
    (11 to 15).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
      .coalesce(1).write.mode("append").parquet(in)
    run() // only the new file's rows
    assert(TxnLake.read(spark, tbl).count() === 15L)
  }

  test("a replayed batch id is a silent no-op (appendOnce marker inside the sink)") {
    val in = mkInput(1 to 9)
    val tbl = fresh("tbl")
    val sink = new TxnSink(spark, tbl, Map("partCol" -> "part", "txnAppId" -> "replay"),
      Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = (1 to 9).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
    sink.addBatch(0L, batch)
    sink.addBatch(0L, batch) // crash-replay of the same micro-batch
    assert(TxnLake.read(spark, tbl).count() === 9L)
    sink.addBatch(1L, batch) // a NEW batch id commits
    assert(TxnLake.read(spark, tbl).count() === 18L)
    assert(TxnLake.lastCommittedTxn(spark, tbl, "replay") === Some(1L))
  }

  test("complete mode: each batch replaces the table; final state = full aggregate") {
    val in = mkInput(1 to 30)
    val tbl = fresh("tbl")
    stream(in).groupBy(col("part"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .writeStream.format("graft-txn").option("partCol", "part")
      .outputMode("complete")
      .option("checkpointLocation", fresh("ck"))
      .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    val got = TxnLake.read(spark, tbl).orderBy("part")
      .as[(String, Long, Long)].collect().toSeq
    val want = (1 to 30).map(i => (s"p${i % 3}", i))
      .groupBy(_._1).map { case (p, xs) => (p, xs.size.toLong, xs.map(_._2 * 2L).sum) }
      .toSeq.sortBy(_._1)
    assert(got === want)
    // the table's history shows per-batch overwrites, not accumulation
    assert(TxnLake.read(spark, tbl).count() === 3L)
  }

  test("update mode and multi-column partitionBy are refused at start") {
    val in = mkInput(1 to 6)
    val e1 = intercept[Exception] {
      stream(in).groupBy(col("part")).agg(count(lit(1)).as("n"))
        .writeStream.format("graft-txn").option("partCol", "part")
        .outputMode("update")
        .option("checkpointLocation", fresh("ck"))
        .trigger(Trigger.AvailableNow()).start(fresh("tbl"))
    }
    assert(e1.getMessage.contains("Append and Complete"))
    val e2 = intercept[Exception] {
      stream(in).writeStream.format("graft-txn").partitionBy("part", "id")
        .option("checkpointLocation", fresh("ck"))
        .trigger(Trigger.AvailableNow()).start(fresh("tbl"))
    }
    assert(e2.getMessage.contains("single partition column"))
  }

  test("first-batch create without partCol or partitionBy fails loudly") {
    val in = mkInput(1 to 6)
    val tbl = fresh("tbl")
    val q = stream(in).writeStream.format("graft-txn")
      .option("checkpointLocation", fresh("ck"))
      .trigger(Trigger.AvailableNow()).start(tbl)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("partCol") ||
      Option(e.getCause).exists(_.getMessage.contains("partCol")))
  }

  test("mergeSchema option grows the table additively from the stream") {
    val tbl = fresh("tbl")
    TxnLake.create(spark, tbl,
      (1 to 3).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "part"), "part")
    val in = fresh("in3") + "/data"
    (4 to 6).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
      .coalesce(1).write.parquet(in)
    spark.readStream.schema("id BIGINT, part STRING, v BIGINT").parquet(in)
      .writeStream.format("graft-txn").option("mergeSchema", "true")
      .option("checkpointLocation", fresh("ck"))
      .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    val got = TxnLake.read(spark, tbl)
    assert(got.columns.toSet === Set("id", "part", "v"))
    assert(got.count() === 6L)
    // pre-evolution rows null-fill; streamed rows carry values
    assert(got.filter(col("v").isNull).count() === 3L)
  }

  test("a case-variant column does not duplicate under mergeSchema") {
    val tbl = fresh("tbl")
    TxnLake.create(spark, tbl,
      (1 to 3).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v"),
      "part")
    // frame carries 'V' — the default case-insensitive resolver must
    // NOT mint a duplicate column next to 'v'
    TxnLake.mergeSchemaFor(spark, tbl,
      Seq((9L, "p0", 9L)).toDF("id", "part", "V"))
    assert(TxnLake.read(spark, tbl).columns.count(_.equalsIgnoreCase("v")) === 1)
  }

  test("a misconfigured sink create surfaces instead of being race-swallowed") {
    val in = mkInput(1 to 6)
    val q = stream(in).writeStream.format("graft-txn")
      .option("partCol", "part").option("identityCol", "part") // = partCol: invalid
      .option("checkpointLocation", fresh("ck"))
      .trigger(Trigger.AvailableNow()).start(fresh("tbl") + "/t")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("partition") || m.contains("BIGINT")),
      s"the configuration error must surface: ${msgs(e)}")
  }

  test("sink onto a pre-existing table appends under its schema and feed") {
    val tbl = fresh("tbl")
    TxnLake.create(spark, tbl,
      (1 to 5).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v"),
      "part", changeFeed = true) // v0, feed on
    val in = mkInput(6 to 15)
    stream(in).writeStream.format("graft-txn")
      .option("checkpointLocation", fresh("ck"))
      .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    assert(TxnLake.read(spark, tbl).count() === 15L)
    // the streamed appends flowed into the change feed
    val feed = graft.streaming.CdcFeed.batch(spark, tbl, fromVersion = 1)
    assert(feed.filter(col("_change_type") === "insert").count() === 10L)
  }
}
