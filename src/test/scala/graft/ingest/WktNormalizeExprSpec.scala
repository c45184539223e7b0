package graft.ingest

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The custom expression must agree bit-for-bit with the regexp_replace
  * chain ([[LineMassager.normalizeWkt]]) on single-block lines (the
  * reference's data shape) — property-tested over randomized WKT. On
  * multi-block lines the expression is strictly better (each block gets
  * its own coordinates; the regex chain splices the FIRST block's
  * normalization everywhere), which is pinned explicitly. */
class WktNormalizeExprSpec extends AnyFunSuite with SparkTestSession {

  private def both(line: String): (String, String) = {
    import spark.implicits._
    val row = Seq(line).toDF("value")
      .select(
        WktNormalizeExpr.wktNormalize(col("value")).as("expr"),
        LineMassager.normalizeWkt(col("value")).as("regex"))
      .collect()(0)
    (row.getString(0), row.getString(1))
  }

  private def randomWkt(rnd: Random): String = {
    val pts = (1 to 1 + rnd.nextInt(5)).map { _ =>
      f"-73.${rnd.nextInt(100)}%02d 40.${rnd.nextInt(100)}%02d"
    }
    s"MULTIPOLYGON (((${pts.mkString(", ")})))"
  }

  test("agrees with the regexp chain on 200 random single-block lines") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val line = s"${rnd.nextInt(10000)},\"${randomWkt(rnd)}\",LP-${rnd.nextInt(999)},QN"
        .replace("\"", "") // normalize stage runs post quote-strip
      val (e, r) = both(line)
      assert(e === r, s"line: $line")
    }
  }

  test("agrees on edge shapes: no geometry, empty ring, token without block") {
    Seq(
      "1,plain,row",
      "MULTIPOLYGON ((( )))",
      "x,MULTIPOLYGON broken,y",
      "MULTIPOLYGON (((1 2)))"
    ).foreach { line =>
      val (e, r) = both(line)
      assert(e === r, s"line: $line")
    }
  }

  test("multi-block line: expression normalizes each block with its own coords") {
    val line = "a,MULTIPOLYGON (((-73.1 40.1))),b,MULTIPOLYGON (((-73.2 40.2))),c"
    val (e, _) = both(line)
    assert(e === "a,-73.1:40.1,b,-73.2:40.2,c")
  }

  test("golden fixture row matches the documented intended semantics") {
    val line = "2001,MULTIPOLYGON (((-73.80 40.79, -73.81 40.80, -73.80 40.79))),LP-9001"
    assert(both(line)._1 === "2001,-73.80:40.79::-73.81:40.80::-73.80:40.79,LP-9001")
  }
}
