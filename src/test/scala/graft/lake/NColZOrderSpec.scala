package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** N-COLUMN ZORDER ([[ZOrder.mortonCodeN]] + the Seq form of
  * [[TxnLake.optimizeZOrder]]): bit-exactness of the generic
  * interleave against a scalar reference, and the point of the whole
  * exercise — after ONE 3-column re-cluster, a range predicate on
  * EACH of the three dimensions prunes files at planning time. */
class NColZOrderSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Scalar reference: bit i of dim j → output bit i*n + j. */
  private def refMorton(dims: Seq[Long]): Long = {
    val n = dims.size; val bits = 63 / n
    dims.zipWithIndex.map { case (v, j) =>
      (0 until bits).map(i => ((v >> i) & 1L) << (i * n + j)).reduce(_ | _)
    }.reduce(_ | _)
  }

  test("mortonCodeN is bit-exact against the scalar reference, 2..4 dims") {
    val samples = Seq(
      Seq(0L, 0L), Seq(65535L, 1L), Seq(12345L, 54321L),
      Seq(1L, 2L, 3L), Seq(2097151L, 0L, 1048576L), Seq(99L, 1234L, 43210L),
      Seq(1L, 2L, 3L, 4L), Seq(32767L, 32767L, 32767L, 32767L))
    samples.foreach { dims =>
      val got = spark.range(1)
        .select(ZOrder.mortonCodeN(dims.map(lit(_))).as("z"))
        .head().getLong(0)
      assert(got === refMorton(dims), s"dims=$dims")
    }
  }

  test("interleave is monotone per dimension with others fixed") {
    // raising one dimension can only raise the curve key when the
    // other dimensions are held constant — the locality property range
    // partitioning relies on
    val vals = Seq(0L, 1L, 100L, 5000L, 2000000L)
    for (a <- vals; b <- vals) {
      val keys = vals.map(x => refMorton(Seq(x, a, b)))
      assert(keys === keys.sorted, s"non-monotone at a=$a b=$b")
    }
  }


  test("after a 3-column ZORDER, every dimension prunes files at planning time") {
    val dir = Files.createTempDirectory("graft_zn").resolve("t").toString
    // three INDEPENDENT uniform dims — before clustering, every file
    // spans every dimension's full range, so nothing can prune
    val rnd = new scala.util.Random(11L)
    val rows = (1 to 3000).map { i =>
      (i.toLong, "p", rnd.nextInt(1000).toDouble,
        rnd.nextInt(1000).toLong, rnd.nextInt(1000).toDouble)
    }
    TxnLake.create(spark, dir, rows.toDF("id", "part", "x", "y", "w"), "part",
      statsCol = Some("x"), statsCols = Seq("y", "w"))
    val stats = TxnLake.optimizeZOrder(spark, dir, Seq("x", "y", "w"),
      rowsPerFile = 200L)
    val lake = spark.read.format("graft-txn").load(dir)
    val total = TxnLake.resolve(spark, dir).get.files.size
    assert(total >= 8, s"need a multi-file layout to show pruning, got $total")
    // correctness first: the re-cluster moved bytes, not rows
    assert(lake.count() === 3000L)
    assert(TxnLake.rowCount(spark, dir) === Some(3000L))
    // each dimension's narrow range must now skip most files
    val sx = scannedFiles(lake.filter(col("x") < 100.0))
    val sy = scannedFiles(lake.filter(col("y") >= 900L))
    val sw = scannedFiles(lake.filter(col("w") < 100.0))
    assert(sx < total && sy < total && sw < total,
      s"3-D zorder must prune on every dimension: x=$sx y=$sy w=$sw of $total")
    // and the answers stay exact
    assert(lake.filter(col("x") < 100.0).count() ===
      rows.count(_._3 < 100.0).toLong)
    assert(lake.filter(col("y") >= 900L).count() ===
      rows.count(_._4 >= 900L).toLong)
    assert(lake.filter(col("w") < 100.0).count() ===
      rows.count(_._5 < 100.0).toLong)
    assert(stats.version === 1L)
  }

  test("1-column ZORDER sorts a STRING column under ANSI (no cast aggregate)") {
    // the advertised 1-column shape: "any orderable type". Under
    // Spark 4's default ANSI mode the old min/max(cast double)
    // normalization aggregate threw for string columns even though the
    // 1-d path never uses bounds — it must aggregate only count(1)
    val dir = Files.createTempDirectory("graft_z1s").resolve("t").toString
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 500).map(i =>
      (i.toLong, "p", rnd.alphanumeric.take(8).mkString))
    TxnLake.create(spark, dir, rows.toDF("id", "part", "s"), "part")
    val stats = TxnLake.optimizeZOrder(spark, dir, Seq("s"), rowsPerFile = 100L)
    assert(stats.version === 1L)
    val lake = spark.read.format("graft-txn").load(dir)
    assert(lake.count() === 500L)
    assert(lake.select("s").as[String].collect().sorted ===
      rows.map(_._3).sorted)
  }
}
