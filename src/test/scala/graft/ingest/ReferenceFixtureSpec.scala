package graft.ingest

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Byte-for-byte golden test against REAL rows of the reference engine's
  * own fixture (reference: src/test/resources/testData.csv:1-6 — header +
  * five NYC-landmark rows with quoted MULTIPOLYGON geometry, input
  * lengths 1.4 KB–42 KB).
  *
  * `expected_actual.txt` holds the output of the reference kernel's
  * observable transform (CSVIngest.java:64-68: quote strip → token drop +
  * trim → coordinate-block delete) applied to those rows, derived
  * independently from the published semantics. If any massage regex
  * drifts from the reference behavior, this fails on real data — the
  * synthetic rows in LineMassagerSpec can't cover, e.g., 42 KB multi-ring
  * blocks or embedded survey-name punctuation. */
class ReferenceFixtureSpec extends AnyFunSuite with SparkTestSession {

  private def resourceLines(name: String): Seq[String] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/reference-fixture/$name"), "UTF-8")
    try src.getLines().toList finally src.close()
  }

  test("actual-mode massage matches reference output on real fixture rows") {
    import spark.implicits._
    val inputs = resourceLines("input_lines.txt")
    val expected = resourceLines("expected_actual.txt")
    assert(inputs.size === 6 && expected.size === 6)

    val out = inputs.toDF("value")
      .select(LineMassager.massage(col("value"), IngestMode.Actual).as("out"))
      .as[String]
      .collect()

    out.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === want, s"fixture row $i diverged from reference output")
    }
  }

  test("normalize-mode on real fixture rows: geometry becomes x:y::… with no leftovers") {
    import spark.implicits._
    val inputs = resourceLines("input_lines.txt")
    val out = inputs.toDF("value")
      .select(LineMassager.massage(col("value"), IngestMode.NormalizeWkt).as("out"))
      .as[String]
      .collect()

    // header row (no geometry) passes through untouched
    assert(out.head === inputs.head)
    out.tail.foreach { line =>
      assert(!line.contains("MULTIPOLYGON"))
      assert(!line.contains("\""))
      assert(!line.contains("((("))
      // normalized coordinate pairs survive as lon:lat::lon:lat
      assert(line.matches(".*-7[34]\\.[0-9]+:40\\.[0-9]+::.*"))
    }
  }
}
