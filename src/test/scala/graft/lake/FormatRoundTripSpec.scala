package graft.lake

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The lake speaks more than parquet: JSON / ORC / CSV round-trips
  * preserve data (SURVEY §2.2 file-formats row). CSV goes through the
  * header+schema path the ingest layer uses. */
class FormatRoundTripSpec extends AnyFunSuite with SparkTestSession {

  private lazy val nation = Tables.nation(spark, sf)

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_$fmt").resolve("t").toString
    nation.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true")
      .schema(nation.schema) // csv/json need the schema to restore types
      .load(dir)
    assert(back.count() === nation.count())
    val a = nation.collect().map(_.mkString("|")).toSet
    val b = back.collect().map(_.mkString("|")).toSet
    assert(a === b, s"$fmt round-trip lost rows")
  }

  test("json round-trip preserves the table")(roundTrip("json"))
  test("orc round-trip preserves the table")(roundTrip("orc"))
  test("csv round-trip preserves the table")(roundTrip("csv"))

  test("orc preserves timestamps exactly") {
    val dir = Files.createTempDirectory("graft_fmt_ts").resolve("t").toString
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
    o.write.format("orc").save(dir)
    val back = spark.read.format("orc").load(dir)
    assert(back.exceptAll(o).count() === 0)
    assert(o.exceptAll(back).count() === 0)
  }
}
