package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def refMorton(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("mortonCode interleaves bits exactly") {
    val pts = Seq[(Long, Long)]((0, 0), (1, 0), (0, 1), (10, 6),
      (65535, 0), (0, 65535), (65535, 65535), (12345, 54321))
    val got = pts.toDF("x", "y")
      .select(ZOrder.mortonCode(col("x"), col("y"))).as[Long].collect()
    val want = pts.map { case (x, y) => refMorton(x, y) }
    assert(got.toSeq === want)
    assert(refMorton(10, 6) === 108L, "hand-checked: 1010 ⋈ 0110 = 1101100")
    assert(refMorton(65535, 65535) === (1L << 32) - 1)
  }

  test("z-order locality: nearby points share high curve bits") {
    // points within a 4x4 tile share all but the low 4 interleaved bits
    val base = ZOrder.mortonCode(lit(100L), lit(200L))
    val tile = for (dx <- 0 to 3; dy <- 0 to 3)
      yield refMorton(100L + dx - (100L % 4), 200L + dy - (200L % 4))
    assert(tile.map(_ >> 4).distinct.size === 1,
      "a 4x4 aligned tile is one contiguous curve segment")
    spark.range(1).select(base).collect() // exercise the column path too
  }

  test("writeZOrdered gives files DISJOINT zkey ranges (file skipping)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val df = spark.range(1, 5000).select(
      (col("id") % 1024).as("x"), ((col("id") * 37) % 1024).as("y"))
    ZOrder.writeZOrdered(df, "x", "y", numFiles = 8, path = dir)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length === 8, "range partitioner must emit the requested files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min("zkey"), max("zkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file zkey ranges overlap: $hi > $lo2 — " +
          "min/max zone maps could not skip files")
      case _ =>
    }
    // round trip: layout changes file placement, never content
    val back = spark.read.parquet(dir)
    assert(back.count() === 4999)
    assert(back.select(sum(col("x")), sum(col("y"))).head() ===
      df.select(sum(col("x")), sum(col("y"))).head())
  }
}
