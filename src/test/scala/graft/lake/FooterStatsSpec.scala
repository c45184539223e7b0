package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The footer-metadata fast path (commit stats from parquet footers,
  * zero Spark jobs) must be INVISIBLE: for every input shape it serves,
  * the manifest it writes is field-for-field identical to what the
  * read-back aggregate job would have written. The spec builds each
  * table twice — once per path, via the
  * `spark.graft.txnlake.footerStats` seam — and compares the resolved
  * manifests modulo the nondeterministic identifiers (commit ids,
  * file names). Shapes footers can NOT serve exactly must fall back,
  * which the manifest comparison also proves (same fields either way).
  */
class FooterStatsSpec extends AnyFunSuite with SparkTestSession {

  private def freshDir(): String =
    Files.createTempDirectory("graft_footerstats").resolve("t").toString

  /** Manifest entries normalized for comparison: identifiers out,
    * everything the engine prunes/plans on in. Sorted by the entry's
    * content so file-name nondeterminism cannot reorder. */
  private def shape(dir: String): Seq[(Set[Option[String]], Option[Double],
      Option[Double], Map[String, (Double, Double)], Option[Long], Option[String])] =
    TxnLake.resolve(spark, dir).get.files
      .map(f => (f.parts, f.zmin, f.zmax, f.stats, f.rows, f.spec))
      .sortBy(_.toString)

  private def viaBoth(build: String => Unit): (String, String) = {
    val (fast, slow) = (freshDir(), freshDir())
    spark.conf.set("spark.graft.txnlake.footerStats", "true")
    build(fast)
    spark.conf.set("spark.graft.txnlake.footerStats", "false")
    try build(slow)
    finally spark.conf.unset("spark.graft.txnlake.footerStats")
    (fast, slow)
  }

  private def assertSameManifest(build: String => Unit): Unit = {
    val (fast, slow) = viaBoth(build)
    assert(shape(fast) === shape(slow))
    assert(TxnLake.read(spark, fast).orderBy(TxnLake.read(spark, fast).columns.map(col): _*).collect().toSeq ===
      TxnLake.read(spark, slow).orderBy(TxnLake.read(spark, slow).columns.map(col): _*).collect().toSeq)
  }

  test("numeric stats + string partition: identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      TxnLake.create(spark, dir,
        (0 until 200).map(i => (i.toLong, s"p${i % 3}", i * 1.5))
          .toDF("id", "part", "v"), "part", statsCol = Some("v"))
      TxnLake.append(spark, dir,
        (200 until 260).map(i => (i.toLong, s"p${i % 3}", i * 1.5))
          .toDF("id", "part", "v"))
    }
  }

  test("long partition column and negative/zero doubles: identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      // doubles spanning -x..0..x: parquet pads zero bounds to -0.0/+0.0,
      // which the footer path must normalize back to the aggregate's 0.0
      TxnLake.create(spark, dir,
        (-100 until 100).map(i => (i.toLong % 4, i.toLong, i.toDouble))
          .toDF("part", "id", "v"), "part", statsCol = Some("v"))
    }
  }

  test("multi-column stats (setStatsColumns): identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      TxnLake.create(spark, dir,
        (0 until 100).map(i => (s"p${i % 2}", i.toLong, i * 0.5, i * 3))
          .toDF("part", "id", "price", "qty"), "part", statsCol = Some("price"))
      TxnLake.setStatsColumns(spark, dir, Seq("qty"))
      TxnLake.append(spark, dir,
        (100 until 160).map(i => (s"p${i % 2}", i.toLong, i * 0.5, i * 3))
          .toDF("part", "id", "price", "qty"))
    }
  }

  test("nullable stats column incl. an all-null file: identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      val withNulls = (0 until 60)
        .map(i => (s"p${i % 2}", i.toLong,
          if (i % 2 == 0) Some(i * 1.0) else None))
        .toDF("part", "id", "v")
      TxnLake.create(spark, dir, withNulls, "part", statsCol = Some("v"))
      // p1 rows carry only null v -> that file must record NO bounds
      val m = TxnLake.resolve(spark, dir).get
      assert(m.files.exists(f => f.zmin.isEmpty && f.zmax.isEmpty),
        "an all-null stats chunk must yield a bounds-free entry")
    }
  }

  test("decimal stats column: identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      TxnLake.create(spark, dir,
        (0 until 80).map(i => (s"p${i % 2}", i.toLong, BigDecimal(i) * BigDecimal("1.25")))
          .toDF("part", "id", "amt"), "part", statsCol = Some("amt"))
    }
  }

  test("timestamp stats column (INT96 writes no footer stats): falls back, identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      TxnLake.create(spark, dir,
        (0 until 50).map(i => (s"p${i % 2}", i.toLong,
          java.sql.Timestamp.valueOf(s"2026-01-${i % 28 + 1} 10:00:00")))
          .toDF("part", "id", "ts"), "part", statsCol = Some("ts"))
      // the fallback must still record bounds (the agg path computes them)
      val m = TxnLake.resolve(spark, dir).get
      assert(m.files.forall(f => f.zmin.isDefined && f.zmax.isDefined),
        "timestamp bounds must survive the footer fallback")
    }
  }

  test("null partition values: identical manifests") {
    import spark.implicits._
    assertSameManifest { dir =>
      val df = (0 until 40)
        .map(i => (if (i % 2 == 0) Some(s"p${i % 4}") else None, i.toLong))
        .toDF("part", "id")
      TxnLake.create(spark, dir, df, "part", statsCol = Some("id"))
    }
  }

  test("bloom-tracked table keeps the aggregate path: blooms recorded") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      (0 until 50).map(i => (s"p${i % 2}", i.toLong, s"u$i"))
        .toDF("part", "id", "user"), "part", bloomCol = Some("user"))
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.forall(_.bloom.isDefined),
      "bloom bits require the row-level job — the footer path must not swallow them")
  }

  test("zone-map pruning still fires on footer-derived bounds") {
    import spark.implicits._
    val dir = freshDir()
    def batch(base: Double) =
      (0 until 20).map(i => (s"p${i % 2}", base.toLong + i, base + i)).toDF("part", "id", "v")
    TxnLake.create(spark, dir, batch(0.0), "part", statsCol = Some("v"))
    TxnLake.append(spark, dir, batch(1000.0))
    TxnLake.append(spark, dir, batch(2000.0))
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.forall(f => f.zmin.isDefined && f.rows.exists(_ > 0)))
    val hit = spark.read.format("graft-txn").load(dir).filter(col("v") >= 2000.0)
    assert(hit.count() === 20)
    assert(TxnLake.rowCount(spark, dir) === Some(60L),
      "metadata-only COUNT(*) rides footer-derived per-file row counts")
  }
}
