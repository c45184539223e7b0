package graft.lake

import graft.{GraftExtensions, SparkTestSession}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Persisted CHECK constraints ([[TxnLake.addCheckConstraint]] + the
  * `ALTER TABLE ... ADD CONSTRAINT ... CHECK` statement): write-time
  * enforcement on every staging path, fail-closed NULLs, retroactive
  * validation, structural-column guards, SHOW TBLPROPERTIES surfacing. */
class CheckConstraintSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_chk").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((1L, 10L, "p1"), (2L, 20L, "p1"), (3L, 30L, "p2"))
        .toDF("id", "v", "part"), "part")
    dir
  }

  test("a non-table directory refuses constraints (nothing persisted)") {
    val dir = Files.createTempDirectory("graft_chk_notbl").resolve("nope").toString
    val e = intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "c", "v > 0")
    }
    assert(e.getMessage.contains("not a txn table"))
    // no _graft_log debris written under the non-table path
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
  }

  test("append enforcement: first violating row aborts, nothing commits") {
    val dir = fresh()
    TxnLake.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val v0 = TxnLake.currentVersion(spark, dir)
    val e = intercept[Exception] {
      TxnLake.append(spark, dir, Seq((4L, -5L, "p1"), (5L, 50L, "p2"))
        .toDF("id", "v", "part"))
    }
    assert(e.getMessage.contains("v_pos") || Option(e.getCause).exists(
      c => Option(c.getMessage).exists(_.contains("v_pos"))),
      s"error should name the constraint: ${e.getMessage}")
    assert(TxnLake.currentVersion(spark, dir) === v0, "no partial commit")
    assert(TxnLake.read(spark, dir).count() === 3L)
    // a clean batch still flows
    TxnLake.append(spark, dir, Seq((6L, 60L, "p2")).toDF("id", "v", "part"))
    assert(TxnLake.read(spark, dir).count() === 4L)
  }

  test("enforcement survives a leading non-table column (guard not prunable)") {
    // regression: the raise_error guard rides a column that survives
    // schema alignment — wrapped onto a dropped extra column it would
    // be pruned away with it, silently bypassing the constraint
    val dir = fresh()
    TxnLake.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    intercept[Exception] {
      TxnLake.append(spark, dir,
        Seq(("junk", 4L, -5L, "p1")).toDF("zz_extra", "id", "v", "part"))
    }
    assert(TxnLake.read(spark, dir).count() === 3L, "nothing committed")
    // and a CLEAN batch with the extra column still flows (column dropped)
    TxnLake.append(spark, dir,
      Seq(("junk", 5L, 50L, "p2")).toDF("zz_extra", "id", "v", "part"))
    assert(TxnLake.read(spark, dir).count() === 4L)
  }

  test("NULL is fail-closed: a predicate evaluating to NULL rejects the row") {
    val dir = fresh()
    TxnLake.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val withNull = Seq((7L, Option.empty[Long], "p1"))
      .toDF("id", "v", "part")
    intercept[Exception] { TxnLake.append(spark, dir, withNull) }
    assert(TxnLake.read(spark, dir).count() === 3L)
  }

  test("retroactive validation: adding over violating data refuses") {
    val dir = fresh()
    val e = intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "v_big", "v > 15")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(TxnLake.checkConstraintsOf(spark, dir).isEmpty)
  }

  test("drop lifts enforcement; duplicate add and unknown drop refuse") {
    val dir = fresh()
    TxnLake.addCheckConstraint(spark, dir, "V_Pos", "v > 0") // stored lower
    assert(TxnLake.checkConstraintsOf(spark, dir) === Map("v_pos" -> "v > 0"))
    intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "v_pos", "v > 1")
    }
    intercept[IllegalArgumentException] {
      TxnLake.dropCheckConstraint(spark, dir, "nope")
    }
    TxnLake.dropCheckConstraint(spark, dir, "nope", ifExists = true)
    TxnLake.dropCheckConstraint(spark, dir, "v_pos")
    TxnLake.append(spark, dir, Seq((8L, -1L, "p1")).toDF("id", "v", "part"))
    assert(TxnLake.read(spark, dir).filter(col("v") < 0).count() === 1L)
  }

  test("updateWhere and merge post-images are enforced") {
    val dir = fresh()
    TxnLake.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    intercept[Exception] {
      TxnLake.updateWhere(spark, dir, col("id") === 1L, Map("v" -> lit(-9L)))
    }
    assert(TxnLake.read(spark, dir).filter(col("v") < 0).count() === 0L)
    intercept[Exception] {
      TxnLake.upsert(spark, dir,
        Seq((2L, -7L, "p1")).toDF("id", "v", "part"), "id")
    }
    assert(TxnLake.read(spark, dir).filter(col("v") < 0).count() === 0L)
    // valid mutations still flow
    TxnLake.updateWhere(spark, dir, col("id") === 1L, Map("v" -> lit(99L)))
    TxnLake.upsert(spark, dir, Seq((2L, 77L, "p1")).toDF("id", "v", "part"), "id")
    assert(TxnLake.read(spark, dir).filter(col("id") <= 2)
      .agg(sum("v")).as[Long].head() === 176L)
  }

  test("expression discipline: unknown column, nondeterminism, bad name refused") {
    val dir = fresh()
    val e1 = intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "c1", "nope > 0")
    }
    assert(e1.getMessage.contains("non-existent column"))
    intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "c2", "rand() > 0.5")
    }
    intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "bad name!", "v > 0")
    }
  }

  test("a column a constraint reads is structural: rename/drop refused") {
    val dir = fresh()
    TxnLake.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      TxnLake.renameColumn(spark, dir, "v", "val")
    }
    assert(e.getMessage.contains("v_pos"))
    intercept[IllegalArgumentException] { TxnLake.dropColumn(spark, dir, "v") }
    // unrelated columns stay mutable
    TxnLake.renameColumn(spark, dir, "id", "key")
    assert(TxnLake.read(spark, dir).columns.contains("key"))
  }


  test("SQL statement surface: ADD/DROP CONSTRAINT, SHOW TBLPROPERTIES") {
    withExtendedSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_chk_sql").resolve("t").toString
      TxnLake.create(s, dir,
        Seq((1L, 10L, "p1"), (2L, 20L, "p2")).toDF("id", "v", "part"), "part")
      s.sql(s"ALTER TABLE graft_txn.`$dir` ADD CONSTRAINT v_pos CHECK (v > 0)")
      assert(TxnLake.checkConstraintsOf(s, dir) === Map("v_pos" -> "v > 0"))
      val props = s.sql(s"SHOW TBLPROPERTIES graft_txn.`$dir`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.constraints.v_pos") === Some("v > 0"))
      intercept[Exception] {
        s.sql(s"INSERT INTO graft_txn.`$dir` VALUES (3L, -1L, 'p1')")
      }
      assert(TxnLake.read(s, dir).count() === 2L)
      // NOT ENFORCED is refused (we always enforce)
      val e = intercept[Exception] {
        s.sql(s"ALTER TABLE graft_txn.`$dir` ADD CONSTRAINT x CHECK (v < 100) NOT ENFORCED")
      }
      assert(e.getMessage.contains("ENFORCED"))
      s.sql(s"ALTER TABLE graft_txn.`$dir` DROP CONSTRAINT IF EXISTS ghost")
      s.sql(s"ALTER TABLE graft_txn.`$dir` DROP CONSTRAINT v_pos")
      s.sql(s"INSERT INTO graft_txn.`$dir` VALUES (3L, -1L, 'p1')")
      assert(TxnLake.read(s, dir).count() === 3L)
    }
  }
}
