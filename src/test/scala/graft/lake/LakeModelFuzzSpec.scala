package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** MODEL-BASED FUZZ of the transactional lake: a seeded random
  * sequence of mutations (append / upsert / keyed delete / predicate
  * delete via deletion vectors / row-level UPDATE / OPTIMIZE incl. DV
  * purge / vacuum / MERGE with WHEN NOT MATCHED BY SOURCE clauses /
  * SQL UPDATE, DELETE, TRUNCATE, OPTIMIZE, VACUUM and RESTORE
  * statements) runs against both [[TxnLake]] and a driver-side
  * `Map[id, row]` reference model, and after EVERY operation the
  * table's full contents and [[TxnLake.rowCount]] must equal the
  * model. Single example-based specs pin each op's contract; this
  * pins their COMPOSITION — the interleavings (a DV landing on a file
  * that OPTIMIZE then rewrites, vacuum after a checkpointed restore
  * point, updates over ride-along rows) where lakehouse bugs actually
  * live. Seeds are fixed, so a failure is a deterministic repro. */
class LakeModelFuzzSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private type Model = Map[Long, (String, String)]

  private def toDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "name", "part")

  /** Sorted row MULTISET, not a keyed map: a .toMap would silently
    * collapse a wrongly-duplicated key (pre-image surviving next to
    * its post-image) and the content check could pass on broken data. */
  private def readRows(dir: String): Seq[(Long, String, String)] =
    TxnLake.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("id"),
        r.getAs[String]("name"), r.getAs[String]("part"))).toSeq.sorted

  private def check(dir: String, model: Model, step: String): Unit = {
    val want = model.toSeq.map { case (id, (n, p)) => (id, n, p) }.sorted
    assert(readRows(dir) === want, s"table diverged from model after $step")
    assert(TxnLake.rowCount(spark, dir) === Some(model.size.toLong),
      s"metadata count diverged after $step")
  }

  /** A restore target must be both model-snapshotted AND still
    * vacuum-retained — the single definition both the API and SQL
    * restore fuzz branches draw from. */
  private def randomRestoreTarget(dir: String, hist: Map[Long, Model],
                                  rnd: scala.util.Random): Long = {
    val retained = TxnLake.history(spark, dir)
      .select("version").collect().map(_.getLong(0)).toSet
    val targets = hist.keySet.intersect(retained).toSeq.sorted
    targets(rnd.nextInt(targets.size))
  }

  private def fuzz(seed: Long, steps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft_fuzz_$seed").resolve("t").toString
    var nextId = 100L
    def freshRows(k: Int): Seq[(Long, String, String)] =
      (1 to k).map { _ =>
        nextId += 1
        (nextId, s"n$nextId-${rnd.nextInt(10)}", s"p${rnd.nextInt(4)}")
      }
    val init = freshRows(6)
    TxnLake.create(spark, dir, toDf(init), "part")
    var model: Model = init.map(r => r._1 -> (r._2, r._3)).toMap
    // model snapshot per committed version, so RESTORE can be fuzzed:
    // the reference rolls back exactly when the table does
    def headVersion(): Long = TxnLake.resolve(spark, dir).get.version
    var hist = Map(0L -> model)
    check(dir, model, "create")
    for (i <- 1 to steps) {
      val step = rnd.nextInt(12) match {
        case 0 =>
          val rows = freshRows(1 + rnd.nextInt(4))
          TxnLake.append(spark, dir, toDf(rows))
          model ++= rows.map(r => r._1 -> (r._2, r._3))
          s"append(${rows.size})"
        case 1 =>
          // upsert: mutate up to 2 existing keys + add 1 fresh
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
            .map(id => (id, s"u$id-$i", model(id)._2))
          val rows = existing ++ freshRows(1)
          TxnLake.upsert(spark, dir, toDf(rows), "id")
          model ++= rows.map(r => r._1 -> (r._2, r._3))
          s"upsert(${rows.size})"
        case 2 =>
          val doomed = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
          TxnLake.delete(spark, dir, doomed.toDF("id"), "id")
          model --= doomed
          s"delete(${doomed.size})"
        case 3 =>
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          TxnLake.deleteWhere(spark, dir, col("id") % m === r)
          model = model.filter { case (id, _) => id % m != r }
          s"deleteWhere(%$m==$r)"
        case 4 =>
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          TxnLake.updateWhere(spark, dir, col("id") % m === r,
            Map("name" -> concat(col("name"), lit(s"+$i"))))
          model = model.map { case (id, (n, p)) =>
            id -> (if (id % m == r) (n + s"+$i", p) else (n, p)) }
          s"updateWhere(%$m==$r)"
        case 5 =>
          TxnLake.optimize(spark, dir, minFiles = 1, purgeDv = rnd.nextBoolean())
          "optimize"
        case 6 =>
          TxnLake.vacuum(spark, dir, keepVersions = 1 + rnd.nextInt(3), graceMs = 0L)
          "vacuum"
        case 7 =>
          // RESTORE to a random RETAINED version; the model rolls back
          // to its snapshot, and the restore commit itself snapshots
          val v = randomRestoreTarget(dir, hist, rnd)
          TxnLake.restore(spark, dir, v)
          model = hist(v)
          s"restore(v$v)"
        case 8 =>
          // full merge with by-source clauses: matched keys replaced,
          // one fresh insert, absent keys in one id-class retired and
          // the next class soft-flagged — first matching clause wins
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
            .map(id => (id, s"m$id-$i", model(id)._2))
          val rows = existing ++ freshRows(1)
          val m0 = 3 + rnd.nextInt(4); val r0 = rnd.nextInt(m0)
          val r1 = (r0 + 1) % m0
          TxnLake.merge(spark, dir, toDf(rows), "id", deleteWhen = lit(false),
            bySource = Seq(
              TxnLake.BySourceDelete(Some(col("id") % m0 === r0)),
              TxnLake.BySourceUpdate(Map("name" -> concat(col("name"), lit("~"))),
                Some(col("id") % m0 === r1))))
          val srcIds = rows.map(_._1).toSet
          model = model.flatMap { case (id, (n, p)) =>
            if (srcIds.contains(id)) Some(id -> ((n, p)))
            else if (id % m0 == r0) None
            else if (id % m0 == r1) Some(id -> ((n + "~", p)))
            else Some(id -> ((n, p)))
          } ++ rows.map(r => r._1 -> ((r._2, r._3)))
          s"mergeBySource(%$m0 del=$r0 upd=$r1)"
        case 9 =>
          // the SQL statement surface mutates through the same engines
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          if (rnd.nextBoolean()) {
            graft.plans.GraftSqlDml.exec(spark,
              s"UPDATE graft_txn.`$dir` SET name = name || '!' WHERE id % $m = $r")
            model = model.map { case (id, (n, p)) =>
              id -> (if (id % m == r) (n + "!", p) else (n, p)) }
            s"sqlUpdate(%$m==$r)"
          } else {
            graft.plans.GraftSqlDml.exec(spark,
              s"DELETE FROM graft_txn.`$dir` WHERE id % $m = $r")
            model = model.filter { case (id, _) => id % m != r }
            s"sqlDelete(%$m==$r)"
          }
        case 10 =>
          // SQL TRUNCATE: one metadata commit empties the table (a
          // no-op on an already-empty table); later appends repopulate
          graft.plans.GraftSqlDml.exec(spark, s"TRUNCATE TABLE graft_txn.`$dir`")
          model = Map.empty
          "sqlTruncate"
        case 11 =>
          // SQL maintenance: layout/retention statements must never
          // change contents; SQL RESTORE rolls the model back with it
          rnd.nextInt(3) match {
            case 0 =>
              graft.plans.GraftSqlDml.exec(spark, s"OPTIMIZE graft_txn.`$dir`")
              "sqlOptimize"
            case 1 =>
              val keep = 1 + rnd.nextInt(3)
              graft.plans.GraftSqlDml.exec(spark,
                s"VACUUM graft_txn.`$dir` RETAIN $keep VERSIONS")
              s"sqlVacuum($keep)"
            case 2 =>
              val v = randomRestoreTarget(dir, hist, rnd)
              graft.plans.GraftSqlDml.exec(spark,
                s"RESTORE TABLE graft_txn.`$dir` TO VERSION AS OF $v")
              model = hist(v)
              s"sqlRestore(v$v)"
          }
      }
      hist += headVersion() -> model
      check(dir, model, s"step $i: $step (seed $seed)")
    }
  }

  test("20 random mutations stay model-equal (seed 7)") { fuzz(7L, 20) }
  test("20 random mutations stay model-equal (seed 1234)") { fuzz(1234L, 20) }
  test("20 random mutations stay model-equal (seed 4242)") { fuzz(4242L, 20) }
}
