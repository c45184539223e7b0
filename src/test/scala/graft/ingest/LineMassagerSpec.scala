package graft.ingest

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output tests for the ingest kernel (SURVEY §3.2 semantics).
  * Fixture rows are self-authored in the reference's *shape* (28-col NYC
  * landmark export with quoted WKT) — values invented here, not copied. */
class LineMassagerSpec extends AnyFunSuite with SparkTestSession {

  private def massage(line: String, mode: IngestMode): String = {
    import spark.implicits._
    Seq(line).toDF("value")
      .select(LineMassager.massage(col("value"), mode).as("out"))
      .collect()(0).getString(0)
  }

  private val geomRow =
    """2001,"MULTIPOLYGON (((-73.80 40.79, -73.81 40.80, -73.80 40.79)))",LP-9001,QN,,,Yes,Sample District,,No,DESIGNATED,DESIGNATED,,06/29/1999 12:00:00 AM +0000,5/4/1999,,,,,,1234.5,678.9,Queens,LP-901,http://example.org/a.pdf,http://example.org/a.jpg,Historic District,06/30/1999 12:00:00 AM +0000"""

  test("actual mode: quotes stripped, geometry block deleted, rest intact") {
    val out = massage(geomRow, IngestMode.Actual)
    assert(out ===
      "2001,,LP-9001,QN,,,Yes,Sample District,,No,DESIGNATED,DESIGNATED,,06/29/1999 12:00:00 AM +0000,5/4/1999,,,,,,1234.5,678.9,Queens,LP-901,http://example.org/a.pdf,http://example.org/a.jpg,Historic District,06/30/1999 12:00:00 AM +0000")
  }

  test("normalize mode: WKT rewritten to x:y::x:y, rest intact") {
    val out = massage(geomRow, IngestMode.NormalizeWkt)
    assert(out.startsWith("2001,-73.80:40.79::-73.81:40.80::-73.80:40.79,LP-9001,QN,"))
    assert(!out.contains("MULTIPOLYGON"))
    assert(!out.contains("\""))
  }

  test("header line passes through unchanged (no quotes, no geometry)") {
    val header = "OBJECTID,the_geom,LP_NUMBER,BOROUGH,AREA_NAME"
    assert(massage(header, IngestMode.Actual) === header)
    assert(massage(header, IngestMode.NormalizeWkt) === header)
  }

  test("quotes stripped even without geometry") {
    assert(massage("""5,"hello, world",x""", IngestMode.Actual) === "5,hello, world,x")
  }

  test("multi-ring block deleted wholesale in actual mode (reference regex is greedy over parens)") {
    val row = """7,"MULTIPOLYGON (((-73.1 40.1, -73.2 40.2)), ((-73.3 40.3)))",end"""
    assert(massage(row, IngestMode.Actual) === "7,,end")
  }

  test("line without WKT is untouched by normalize mode") {
    val row = "9,plain,row"
    assert(massage(row, IngestMode.NormalizeWkt) === row)
  }
}
