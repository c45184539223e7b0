package graft.ingest

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaManifestSpec extends AnyFunSuite {

  private val properForm =
    """{"schema": [
      |  {"key": "OBJECTID", "type": "int", "partition_key": "false", "comment": "id"},
      |  {"key": "BOROUGH", "type": "string", "partition_key": "true", "comment": ""},
      |  {"key": "Shape_area", "type": "double", "partition_key": "false", "comment": ""}
      |]}""".stripMargin

  test("parses the proper object form") {
    val m = SchemaManifest.parse(properForm)
    assert(m.keys === Seq("OBJECTID", "BOROUGH", "Shape_area"))
    assert(m.partitionColumns === Seq("BOROUGH"))
  }

  test("parses a bare array form") {
    val m = SchemaManifest.parse("""[{"key": "a", "type": "string", "partition_key": "false", "comment": ""}]""")
    assert(m.keys === Seq("a"))
  }

  test("repairs the reference's malformed bare-key form (testSchema.json:1)") {
    val bare =
      """"schema": [
        |  {"key": "x", "type": "timestamp", "partition_key": "false", "comment": ""}
        |]""".stripMargin
    val m = SchemaManifest.parse(bare)
    assert(m.keys === Seq("x"))
    assert(m.fields.head.dataType === TimestampType)
  }

  test("type mapping covers latent fixture types; unknown degrades to string") {
    assert(ManifestField.typeFor("int") === IntegerType)
    assert(ManifestField.typeFor("double") === DoubleType)
    assert(ManifestField.typeFor("timestamp") === TimestampType)
    assert(ManifestField.typeFor("bogus") === StringType)
    assert(ManifestField.typeFor("string") === StringType)
  }

  test("toStructType carries comment + partition_key metadata") {
    val st = SchemaManifest.parse(properForm).toStructType
    assert(st.fields.map(_.name).toSeq === Seq("OBJECTID", "BOROUGH", "Shape_area"))
    assert(st("OBJECTID").dataType === IntegerType)
    assert(st("OBJECTID").metadata.getString("comment") === "id")
    assert(st("BOROUGH").metadata.getBoolean("partition_key"))
  }

  test("unparseable manifest throws instead of silently emptying (unlike CSVIngest.java:139-144)") {
    assertThrows[SchemaValidationException](SchemaManifest.parse("not json at all {"))
    assertThrows[SchemaValidationException](SchemaManifest.parse("""{"other": 1}"""))
    assertThrows[SchemaValidationException](SchemaManifest.parse("""[{"type": "string"}]"""))
  }
}
