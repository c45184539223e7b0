package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `OPTIMIZE ... ZORDER BY` on the transactional lake
  * ([[TxnLake.optimizeZOrder]]): one atomic rewrite re-clusters rows
  * along the Morton curve so multi-column zone maps get tight in BOTH
  * dimensions — range predicates on either column skip files. */
class ZOrderLakeSpec extends AnyFunSuite with SparkTestSession {

  /** One partition, 4096 rows on a 64×64 grid, INSERTED IN SHUFFLED
    * ORDER across 4 commits — pre-optimize, every file spans nearly the
    * full range of both x and y, so nothing prunes. */
  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zol").resolve("t").toString
    val rows = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle((0 until 4096).toList)
      .map(i => (i.toLong, "p", (i % 64).toDouble, (i / 64).toDouble))
    def df(xs: List[(Long, String, Double, Double)]) =
      xs.toDF("id", "part", "x", "y")
    val quarters = rows.grouped(1024).toList
    TxnLake.create(spark, dir, df(quarters.head), "part",
      statsCol = Some("x"), statsCols = Seq("y"))
    quarters.tail.foreach(q => TxnLake.append(spark, dir, df(q)))
    dir
  }

  private def lake(dir: String): DataFrame =
    spark.read.format("graft-txn").load(dir)


  test("z-order rewrite makes BOTH dimensions prunable; results unchanged") {
    val dir = freshTable()
    val before = TxnLake.read(spark, dir).orderBy("id").collect().toSeq
    val allBefore = scannedFiles(lake(dir))
    // shuffled inserts: a narrow box on either axis still scans everything
    assert(scannedFiles(lake(dir).filter(col("y") < 8.0)) === allBefore,
      "precondition: shuffled layout must not prune")
    val stats = TxnLake.optimizeZOrder(spark, dir, "x", "y", rowsPerFile = 256L)
    assert(stats.filesAfter >= 8, s"expected ~16 curve segments, got ${stats.filesAfter}")
    val allAfter = scannedFiles(lake(dir))
    val onX = scannedFiles(lake(dir).filter(col("x") < 8.0))
    val onY = scannedFiles(lake(dir).filter(col("y") < 8.0))
    assert(onX < allAfter, s"x-range must skip files after z-order ($onX/$allAfter)")
    assert(onY < allAfter, s"y-range must skip files after z-order ($onY/$allAfter)")
    // a 2-D box prunes hardest
    val box = scannedFiles(lake(dir).filter(col("x") < 8.0 && col("y") < 8.0))
    assert(box <= onX && box <= onY)
    // the rewrite is pure layout: every row survives bit-identically
    assert(TxnLake.read(spark, dir).orderBy("id").collect().toSeq === before)
    // and it is one atomic commit: the pre-optimize version still serves
    assert(TxnLake.readVersion(spark, dir, stats.version - 1)
      .count() === 4096L)
  }

  test("z-order retires outstanding deletion vectors (reads live rows)") {
    val dir = freshTable()
    TxnLake.deleteWhere(spark, dir, col("id") < 100L)
    assert(TxnLake.resolve(spark, dir).get.files.exists(_.dv.nonEmpty))
    TxnLake.optimizeZOrder(spark, dir, "x", "y", rowsPerFile = 256L)
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.forall(_.dv.isEmpty), "rewritten files carry no vectors")
    assert(TxnLake.read(spark, dir).count() === 3996L)
  }
}
