package graft.lake

import graft.{GraftExtensions, SparkTestSession}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** COLUMN DEFAULT VALUES ([[TxnLake.setColumnDefault]] + `ALTER TABLE
  * ... ADD COLUMN ... DEFAULT` / `ALTER COLUMN ... SET/DROP DEFAULT`):
  * write-time fill of absent columns, supplied-value precedence,
  * constant-expression discipline, rename/drop bookkeeping, SQL
  * round-trip. */
class ColumnDefaultSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_dflt").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((1L, 10L, "p1"), (2L, 20L, "p2")).toDF("id", "v", "part"), "part")
    dir
  }

  test("absent defaulted columns fill on append/merge; supplied values win") {
    val dir = fresh()
    TxnLake.addColumn(spark, dir, "source", org.apache.spark.sql.types.StringType)
    TxnLake.setColumnDefault(spark, dir, "source", "'bulk'")
    // append WITHOUT the column: the default fills
    TxnLake.append(spark, dir, Seq((3L, 30L, "p1")).toDF("id", "v", "part"))
    // append WITH the column: the supplied value wins
    TxnLake.append(spark, dir,
      Seq((4L, 40L, "p2", "api")).toDF("id", "v", "part", "source"))
    // upsert WITHOUT the column
    TxnLake.upsert(spark, dir, Seq((5L, 50L, "p1")).toDF("id", "v", "part"), "id")
    val got = TxnLake.read(spark, dir).orderBy("id")
      .select("id", "source").as[(Long, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, None), (2L, None), // pre-default rows stay null (ANSI rule)
      (3L, Some("bulk")), (4L, Some("api")), (5L, Some("bulk"))))
  }

  test("merge never stomps matched rows with the default (insert-only fill)") {
    val dir = fresh()
    TxnLake.addColumn(spark, dir, "source", org.apache.spark.sql.types.StringType)
    TxnLake.setColumnDefault(spark, dir, "source", "'bulk'")
    // row 3 lands with an explicit, non-default value
    TxnLake.append(spark, dir,
      Seq((3L, 30L, "p1", "api")).toDF("id", "v", "part", "source"))
    // upsert OMITTING the defaulted column: touches 3 (matched) and
    // inserts 6 (new). Delta rule: defaults fill INSERT paths only —
    // row 3 must keep 'api', row 6 takes 'bulk'.
    TxnLake.upsert(spark, dir,
      Seq((3L, 33L, "p1"), (6L, 60L, "p2")).toDF("id", "v", "part"), "id")
    val got = TxnLake.read(spark, dir).filter(col("id").isin(3L, 6L))
      .orderBy("id").select("id", "v", "source")
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got === Seq((3L, 33L, Some("api")), (6L, 60L, Some("bulk"))))
    // matched rows whose stored value is NULL stay NULL (coalesce-style
    // substitution would wrongly resurrect the default): rows 1/2
    // predate the column, so their post-images must carry NULL through
    TxnLake.upsert(spark, dir,
      Seq((1L, 11L, "p1")).toDF("id", "v", "part"), "id")
    assert(TxnLake.read(spark, dir).filter(col("id") === 1L)
      .select("v", "source").as[(Long, Option[String])].head() === ((11L, None)))
  }

  test("discipline: unknown column, column references, nondeterminism refused") {
    val dir = fresh()
    intercept[IllegalArgumentException] {
      TxnLake.setColumnDefault(spark, dir, "ghost", "'x'")
    }
    val e = intercept[IllegalArgumentException] {
      TxnLake.setColumnDefault(spark, dir, "v", "id + 1")
    }
    assert(e.getMessage.contains("constant"))
    intercept[IllegalArgumentException] {
      TxnLake.setColumnDefault(spark, dir, "v", "rand()")
    }
  }

  test("drop default stops the fill; rename moves it; drop column clears it") {
    val dir = fresh()
    TxnLake.setColumnDefault(spark, dir, "v", "99")
    TxnLake.dropColumnDefault(spark, dir, "v")
    intercept[Exception] { // v now required again
      TxnLake.append(spark, dir, Seq((6L, "p1")).toDF("id", "part"))
    }
    intercept[IllegalArgumentException] {
      TxnLake.dropColumnDefault(spark, dir, "v")
    }
    TxnLake.dropColumnDefault(spark, dir, "v", ifExists = true)
    TxnLake.setColumnDefault(spark, dir, "v", "77")
    TxnLake.renameColumn(spark, dir, "v", "val")
    assert(TxnLake.columnDefaultsOf(spark, dir) === Map("val" -> "77"))
    TxnLake.append(spark, dir, Seq((7L, "p1")).toDF("id", "part"))
    assert(TxnLake.read(spark, dir).filter(col("id") === 7L)
      .select("val").as[Long].head() === 77L)
    TxnLake.dropColumn(spark, dir, "val")
    assert(TxnLake.columnDefaultsOf(spark, dir).isEmpty)
  }


  test("SQL: ADD COLUMN DEFAULT, ALTER COLUMN SET/DROP DEFAULT, INSERT column list") {
    withExtendedSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_dflt_sql").resolve("t").toString
      TxnLake.create(s, dir,
        Seq((1L, 10L, "p1")).toDF("id", "v", "part"), "part")
      // ADD COLUMN ... DEFAULT is refused (Delta's rule): existing rows
      // would read NULL, not the default ANSI promises them
      val ref = intercept[Exception] {
        s.sql(s"ALTER TABLE graft_txn.`$dir` ADD COLUMN source STRING DEFAULT 'x'")
      }
      assert(ref.getMessage.contains("not supported"))
      s.sql(s"ALTER TABLE graft_txn.`$dir` ADD COLUMN source STRING")
      s.sql(s"ALTER TABLE graft_txn.`$dir` ALTER COLUMN source SET DEFAULT 'bulk'")
      assert(TxnLake.columnDefaultsOf(s, dir) === Map("source" -> "'bulk'"))
      // INSERT with a column list omitting the defaulted column
      s.sql(s"INSERT INTO graft_txn.`$dir` (id, v, part) VALUES (2L, 20L, 'p2')")
      assert(TxnLake.read(s, dir).filter(col("id") === 2L)
        .select("source").as[String].head() === "bulk")
      val props = s.sql(s"SHOW TBLPROPERTIES graft_txn.`$dir`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.defaults.source") === Some("'bulk'"))
      s.sql(s"ALTER TABLE graft_txn.`$dir` ALTER COLUMN source SET DEFAULT 'stream'")
      s.sql(s"INSERT INTO graft_txn.`$dir` (id, v, part) VALUES (3L, 30L, 'p1')")
      assert(TxnLake.read(s, dir).filter(col("id") === 3L)
        .select("source").as[String].head() === "stream")
      s.sql(s"ALTER TABLE graft_txn.`$dir` ALTER COLUMN source DROP DEFAULT")
      assert(TxnLake.columnDefaultsOf(s, dir).isEmpty)
    }
  }
}
