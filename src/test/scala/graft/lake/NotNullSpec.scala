package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** NOT NULL column constraints ([[TxnLake.setNotNull]] + `ALTER TABLE
  * ... ALTER COLUMN c SET/DROP NOT NULL`): write-time enforcement via
  * the reserved-name CHECK machinery, retroactive validation, the
  * follow-the-column rule (rename migrates, drop removes), and the
  * SQL round-trip. */
class NotNullSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_nn").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((1L, Some(10L), "p1"), (2L, Some(20L), "p2"))
        .toDF("id", "v", "part"), "part")
    dir
  }

  test("enforcement: a NULL row aborts the write; clean rows land") {
    val dir = fresh()
    TxnLake.setNotNull(spark, dir, "v")
    assert(TxnLake.notNullColumnsOf(spark, dir) === Set("v"))
    val v0 = TxnLake.currentVersion(spark, dir)
    val e = intercept[Exception] {
      TxnLake.append(spark, dir,
        Seq((3L, None: Option[Long], "p1")).toDF("id", "v", "part"))
    }
    assert(e.getMessage.contains("graft_not_null_v") ||
      Option(e.getCause).exists(_.getMessage.contains("graft_not_null_v")))
    assert(TxnLake.currentVersion(spark, dir) === v0) // nothing committed
    TxnLake.append(spark, dir,
      Seq((3L, Some(30L), "p1")).toDF("id", "v", "part"))
    assert(TxnLake.read(spark, dir).count() === 3)
  }

  test("retroactive: declaring over existing NULLs refuses; re-declare refuses") {
    val dir = fresh()
    TxnLake.append(spark, dir,
      Seq((3L, None: Option[Long], "p1")).toDF("id", "v", "part"))
    val e = intercept[IllegalArgumentException] {
      TxnLake.setNotNull(spark, dir, "v")
    }
    assert(e.getMessage.contains("violate"))
    TxnLake.setNotNull(spark, dir, "id")
    intercept[IllegalArgumentException] { TxnLake.setNotNull(spark, dir, "id") }
    intercept[IllegalArgumentException] { TxnLake.setNotNull(spark, dir, "ghost") }
  }

  test("drop lifts the gate; IF EXISTS semantics") {
    val dir = fresh()
    TxnLake.setNotNull(spark, dir, "v")
    TxnLake.dropNotNull(spark, dir, "v")
    assert(TxnLake.notNullColumnsOf(spark, dir).isEmpty)
    TxnLake.append(spark, dir,
      Seq((3L, None: Option[Long], "p1")).toDF("id", "v", "part"))
    assert(TxnLake.read(spark, dir).filter(col("v").isNull).count() === 1)
    intercept[IllegalArgumentException] { TxnLake.dropNotNull(spark, dir, "v") }
    TxnLake.dropNotNull(spark, dir, "v", ifExists = true) // no-op
  }

  test("the constraint FOLLOWS its column: rename migrates, drop removes") {
    val dir = fresh()
    TxnLake.setNotNull(spark, dir, "v")
    // rename: unlike a user CHECK (which refuses), the NOT NULL moves
    TxnLake.renameColumn(spark, dir, "v", "val")
    assert(TxnLake.notNullColumnsOf(spark, dir) === Set("val"))
    intercept[Exception] {
      TxnLake.append(spark, dir,
        Seq((3L, None: Option[Long], "p1")).toDF("id", "val", "part"))
    }
    // a USER check on the column still blocks renames
    TxnLake.addCheckConstraint(spark, dir, "val_pos", "val > 0")
    intercept[IllegalArgumentException] {
      TxnLake.renameColumn(spark, dir, "val", "v2")
    }
    TxnLake.dropCheckConstraint(spark, dir, "val_pos")
    // drop column: the NOT NULL dies with it, no dangling constraint
    TxnLake.dropColumn(spark, dir, "val")
    assert(TxnLake.notNullColumnsOf(spark, dir).isEmpty)
    assert(TxnLake.checkConstraintsOf(spark, dir).isEmpty)
  }

  test("merge post-images and streaming-style appends are gated too") {
    val dir = fresh()
    TxnLake.setNotNull(spark, dir, "v")
    // upsert whose post-image nulls the column aborts
    intercept[Exception] {
      TxnLake.upsert(spark, dir,
        Seq((1L, None: Option[Long], "p1")).toDF("id", "v", "part"), "id")
    }
    // clean upsert lands
    TxnLake.upsert(spark, dir,
      Seq((1L, Some(11L), "p1")).toDF("id", "v", "part"), "id")
    assert(TxnLake.read(spark, dir).filter(col("id") === 1L)
      .select("v").as[Long].head() === 11L)
  }

  test("the graft_not_null_ namespace is reserved: a user CHECK cannot squat it") {
    val dir = fresh()
    // a user constraint reusing the reserved name with a DIFFERENT
    // predicate would be silently dropped by DROP NOT NULL and
    // misreported by notNullColumnsOf — refused at declare time
    val e = intercept[IllegalArgumentException] {
      TxnLake.addCheckConstraint(spark, dir, "graft_not_null_v", "v > 0")
    }
    assert(e.getMessage.contains("reserved"))
    // a LEGACY squatter (pre-reservation table): neither reported as a
    // NOT NULL column nor droppable via dropNotNull
    val fs = TxnLake.fsOf(spark, dir)
    TxnLake.setNotNull(spark, dir, "v")
    TxnLake.dropNotNull(spark, dir, "v")
    // plant the squatter directly in the constraints file, as old code
    // would have allowed
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_log/_check_constraints.json")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.createObjectNode()
    n.put("graft_not_null_id", "id > 0")
    val out = fs.create(p, true)
    try out.write(m.writeValueAsBytes(n)) finally out.close()
    assert(TxnLake.notNullColumnsOf(spark, dir).isEmpty,
      "a squatting user CHECK must not read as a NOT NULL column")
    intercept[IllegalArgumentException] {
      TxnLake.dropNotNull(spark, dir, "id") // must NOT drop the user CHECK
    }
    assert(TxnLake.checkConstraintsOf(spark, dir).contains("graft_not_null_id"))
  }

  test("SQL: ALTER COLUMN SET/DROP NOT NULL + SHOW TBLPROPERTIES surface") {
    withExtendedSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_nn_sql").resolve("t").toString
      TxnLake.create(s, dir,
        Seq((1L, Some(10L), "p1")).toDF("id", "v", "part"), "part")
      s.sql(s"ALTER TABLE graft_txn.`$dir` ALTER COLUMN v SET NOT NULL")
      assert(TxnLake.notNullColumnsOf(s, dir) === Set("v"))
      val props = s.sql(s"SHOW TBLPROPERTIES graft_txn.`$dir`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.constraints.graft_not_null_v")
        === Some("`v` IS NOT NULL"))
      intercept[Exception] {
        s.sql(s"INSERT INTO graft_txn.`$dir` VALUES (2L, CAST(NULL AS BIGINT), 'p1')")
      }
      s.sql(s"ALTER TABLE graft_txn.`$dir` ALTER COLUMN v DROP NOT NULL")
      assert(TxnLake.notNullColumnsOf(s, dir).isEmpty)
      s.sql(s"INSERT INTO graft_txn.`$dir` VALUES (2L, CAST(NULL AS BIGINT), 'p1')")
      assert(TxnLake.read(s, dir).count() === 2)
    }
  }
}
