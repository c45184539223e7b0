package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TxnLake.restore]]: rollback as a forward commit — history intact,
  * metadata-only, OCC-safe. */
class RestoreSpec extends AnyFunSuite with SparkTestSession {

  private def fresh(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_restore").resolve("t").toString
    TxnLake.create(spark, dir,
      (1L to 8L).map(i => (i, s"n$i", s"p${i % 2}")).toDF("id", "name", "part"),
      "part")
    dir
  }

  private def names(dir: String): Seq[String] =
    TxnLake.read(spark, dir).orderBy("id").collect().map(_.getAs[String]("name")).toSeq

  test("restore rolls data back and history forward") {
    import spark.implicits._
    val dir = fresh()
    TxnLake.upsert(spark, dir, Seq((1L, "BAD", "p1")).toDF("id", "name", "part"), "id") // v1
    TxnLake.delete(spark, dir, Seq(2L).toDF("id"), "id")                                // v2
    assert(names(dir) === Seq("BAD", "n3", "n4", "n5", "n6", "n7", "n8"))
    TxnLake.restore(spark, dir, 0L)                                                     // v3
    assert(names(dir) === (1L to 8L).map(i => s"n$i"))
    // history keeps all four versions; the bad ones remain travel-able
    assert(TxnLake.history(spark, dir).count() === 4L)
    assert(TxnLake.readVersion(spark, dir, 2L).count() === 7L)
    // the table stays writable after a restore
    TxnLake.append(spark, dir, Seq((9L, "n9", "p1")).toDF("id", "name", "part"))
    assert(names(dir) === (1L to 9L).map(i => s"n$i"))
    // restoring the restore rolls forward again
    TxnLake.restore(spark, dir, 2L)
    assert(names(dir) === Seq("BAD", "n3", "n4", "n5", "n6", "n7", "n8"))
  }

  test("restore to the current state is a no-op commit-wise") {
    val dir = fresh()
    val v = TxnLake.resolve(spark, dir).get.version
    TxnLake.restore(spark, dir, v)
    assert(TxnLake.resolve(spark, dir).get.version === v)
  }

  test("restore across a deletion-vector commit reinstates the deleted rows") {
    val dir = fresh()
    TxnLake.deleteWhere(spark, dir, col("id") <= 4L) // v1, DVs only
    assert(TxnLake.read(spark, dir).count() === 4L)
    TxnLake.restore(spark, dir, 0L)                  // v2: entries without dv
    assert(TxnLake.read(spark, dir).count() === 8L)
    assert(TxnLake.resolve(spark, dir).get.files.forall(_.dv.isEmpty))
  }

  test("restore across a partition evolution reinstates the old column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_restore").resolve("e").toString
    TxnLake.create(spark, dir,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "grp", "cat"), "grp")
    TxnLake.evolvePartitioning(spark, dir, "cat")    // v1
    TxnLake.restore(spark, dir, 0L)                  // v2
    assert(TxnLake.resolve(spark, dir).get.partCol === "grp")
  }
}
