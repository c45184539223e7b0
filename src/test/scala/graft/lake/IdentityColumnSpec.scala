package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** IDENTITY COLUMNS ([[TxnLake.setIdentityColumn]]): engine-assigned
  * unique increasing BIGINTs across commits, GENERATED ALWAYS
  * semantics, watermark persistence, OCC conflict on concurrent
  * allocation, structural guards. */
class IdentityColumnSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_ident").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq.empty[(Long, Long, String)].toDF("uid", "v", "part"), "part")
    TxnLake.setIdentityColumn(spark, dir, "uid", start = 100L, step = 1L)
    dir
  }

  private def uids(dir: String): Seq[Long] =
    TxnLake.read(spark, dir).select("uid").as[Long].collect().toSeq

  test("appends get unique increasing ids across commits; gaps allowed") {
    val dir = fresh()
    TxnLake.append(spark, dir,
      (1 to 10).map(i => (i.toLong, s"p${i % 2}")).toDF("v", "part"))
    val first = uids(dir)
    assert(first.size === 10 && first.distinct.size === 10)
    assert(first.forall(_ >= 100L), s"ids start at 100: $first")
    TxnLake.append(spark, dir,
      (11 to 15).map(i => (i.toLong, s"p${i % 2}")).toDF("v", "part"))
    val all = uids(dir)
    assert(all.size === 15 && all.distinct.size === 15)
    val second = all.filterNot(first.contains)
    assert(second.forall(_ > first.max),
      "second commit's ids all above the first commit's watermark")
  }

  test("GENERATED ALWAYS: supplying the column is refused") {
    val dir = fresh()
    val e = intercept[Exception] {
      TxnLake.append(spark, dir,
        Seq((999L, 1L, "p0")).toDF("uid", "v", "part"))
    }
    assert(e.getMessage.contains("IDENTITY"))
  }

  test("declaring on existing values advances the mark past their max") {
    val dir = Files.createTempDirectory("graft_ident2").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((5000L, 1L, "p0"), (7000L, 2L, "p1")).toDF("uid", "v", "part"), "part")
    TxnLake.setIdentityColumn(spark, dir, "uid", start = 1L)
    assert(TxnLake.identityHighWaterMark(spark, dir, "uid") === Some(7000L))
    TxnLake.append(spark, dir, Seq((3L, "p0")).toDF("v", "part"))
    val fresh = uids(dir).filterNot(Seq(5000L, 7000L).contains)
    assert(fresh.size === 1 && fresh.head > 7000L,
      s"new id must exceed existing max: $fresh")
  }

  test("a stale identity base aborts under OCC; restaging succeeds") {
    val dir = fresh()
    val base = TxnLake.resolve(spark, dir).get
    TxnLake.append(spark, dir, Seq((1L, "p0")).toDF("v", "part")) // advances mark
    // stage against the STALE base (simulating the losing concurrent writer)
    val staged = TxnLake.stageAppend(spark, dir, base,
      Seq((2L, "p1")).toDF("v", "part")).get
    intercept[java.util.ConcurrentModificationException] {
      TxnLake.commitStaged(spark, dir, staged)
    }
    // the engine entry restages from the fresh head and lands
    TxnLake.append(spark, dir, Seq((3L, "p1")).toDF("v", "part"))
    val ids = uids(dir)
    assert(ids.size === 2 && ids.distinct.size === 2,
      s"two committed rows, unique ids: $ids")
  }

  test("reservation overflow fails loudly before any id is assigned") {
    val dir = Files.createTempDirectory("graft_ident_of").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((1L, 1L, "p0")).toDF("uid", "v", "part"), "part")
    // step * span (span >= 2^36) wraps 64-bit arithmetic: a wrapped-but-
    // positive watermark would pass a naive `newHigh > lastUsed` check
    // while actually-assigned ids exceed it — later appends would then
    // hand out OVERLAPPING ids. The exact-arithmetic guard must throw.
    TxnLake.setIdentityColumn(spark, dir, "uid", start = 1L, step = 1L << 40)
    val e = intercept[IllegalArgumentException] {
      TxnLake.append(spark, dir, Seq((2L, "p0")).toDF("v", "part"))
    }
    assert(e.getMessage.contains("overflow"))
    assert(TxnLake.read(spark, dir).count() === 1) // nothing committed
  }

  test("guards: BIGINT only, no partition/default/generated overlap, no rename/drop") {
    val dir = Files.createTempDirectory("graft_ident3").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((1, 1L, "p0")).toDF("small", "uid", "part"), "part")
    intercept[IllegalArgumentException] {
      TxnLake.setIdentityColumn(spark, dir, "small") // INT, not BIGINT
    }
    intercept[IllegalArgumentException] {
      TxnLake.setIdentityColumn(spark, dir, "part")
    }
    TxnLake.setIdentityColumn(spark, dir, "uid")
    intercept[IllegalArgumentException] {
      TxnLake.renameColumn(spark, dir, "uid", "uid2")
    }
    intercept[IllegalArgumentException] { TxnLake.dropColumn(spark, dir, "uid") }
    intercept[IllegalArgumentException] {
      TxnLake.setColumnDefault(spark, dir, "uid", "0")
    }
  }

  test("a clone carries the identity declaration and watermark") {
    val dir = fresh()
    TxnLake.append(spark, dir,
      (1 to 5).map(i => (i.toLong, s"p${i % 2}")).toDF("v", "part"))
    val mark = TxnLake.identityHighWaterMark(spark, dir, "uid").get
    val dst = Files.createTempDirectory("graft_ident_clone").resolve("c").toString
    TxnLake.clone(spark, dir, dst)
    assert(TxnLake.identityColumnsOf(spark, dst) === Map("uid" -> (100L, 1L)))
    assert(TxnLake.identityHighWaterMark(spark, dst, "uid") === Some(mark))
    TxnLake.append(spark, dst, Seq((9L, "p0")).toDF("v", "part"))
    val cloneIds = TxnLake.read(spark, dst).select("uid").as[Long].collect().toSeq
    assert(cloneIds.distinct.size === 6, s"no collision in the clone: $cloneIds")
  }

  test("identityCol option on the write and sink create paths") {
    // df.write.format: batch 0's rows get ids through the allocating append
    val dir = Files.createTempDirectory("graft_ident_ds").resolve("t").toString
    (1 to 6).map(i => (i.toLong, s"p${i % 2}")).toDF("v", "part")
      .write.format("graft-txn")
      .option("partCol", "part").option("identityCol", "uid")
      .option("identityStart", "50").save(dir)
    val ids = TxnLake.read(spark, dir).select("uid").as[Long].collect().toSeq
    assert(ids.size === 6 && ids.distinct.size === 6 && ids.forall(_ >= 50L))
    // streaming sink first-batch create declares the column too
    val in = Files.createTempDirectory("graft_ident_in").toString + "/d"
    (1 to 4).map(i => (i.toLong, s"p${i % 2}")).toDF("v", "part")
      .coalesce(1).write.parquet(in)
    val tbl = Files.createTempDirectory("graft_ident_sink").resolve("t").toString
    spark.readStream.schema("v BIGINT, part STRING").parquet(in)
      .writeStream.format("graft-txn")
      .option("partCol", "part").option("identityCol", "uid")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ident_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(tbl).awaitTermination()
    val sunk = TxnLake.read(spark, tbl).select("uid").as[Long].collect().toSeq
    assert(sunk.size === 4 && sunk.distinct.size === 4 && sunk.forall(_ >= 1L))
    // SHOW TBLPROPERTIES surfaces the declaration
    val props = graft.plans.GraftSqlDml
      .exec(spark, s"SHOW TBLPROPERTIES graft_txn.`$dir`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.identity.uid") === Some("START WITH 50 STEP 1"))
  }

  test("two real writer threads never collide ids (retry on OCC abort)") {
    val dir = fresh()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def appendWithRetry(rows: Seq[(Long, String)]): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        require(attempts <= 25, "retry budget exhausted")
        try { TxnLake.append(spark, dir,
          rows.toDF("v", "part")); done = true }
        catch { case _: java.util.ConcurrentModificationException => () }
      }
    }
    val futures = (0 until 2).map { t =>
      scala.concurrent.Future {
        (0 until 5).foreach { b =>
          appendWithRetry((0 until 7).map(i =>
            ((t * 100 + b * 10 + i).toLong, s"p${i % 2}")))
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    val ids = uids(dir)
    assert(ids.size === 70, s"all 10 batches landed: ${ids.size}")
    assert(ids.distinct.size === 70, "no id collisions under real contention")
  }

  test("the watermark folds through checkpoints and survives vacuum") {
    val dir = fresh()
    TxnLake.append(spark, dir, Seq((1L, "p0")).toDF("v", "part"))
    val mark = TxnLake.identityHighWaterMark(spark, dir, "uid").get
    (1 to 12).foreach(i => TxnLake.append(spark, dir,
      Seq((i.toLong, "p0")).toDF("v", "part")))
    TxnLake.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    val after = TxnLake.identityHighWaterMark(spark, dir, "uid").get
    assert(after >= mark, "vacuum must not regress the identity watermark")
    TxnLake.append(spark, dir, Seq((99L, "p1")).toDF("v", "part"))
    assert(uids(dir).distinct.size === uids(dir).size, "still no collisions")
  }
}
