package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class SchemaRegistrySpec extends AnyFunSuite {

  private def manifest(keys: String*) =
    SchemaManifest(keys.map(k => ManifestField(k, "string", partitionKey = false, "")))

  test("longest-prefix lookup resolves the most specific manifest") {
    val r = new SchemaRegistry
    r.register("/lake/raw/", manifest("a"))
    r.register("/lake/raw/landmarks/", manifest("a", "b"))
    assert(r.lookup("/lake/raw/landmarks/2020.csv").get.keys === Seq("a", "b"))
    assert(r.lookup("/lake/raw/other.csv").get.keys === Seq("a"))
    assert(r.lookup("/elsewhere/x.csv").isEmpty)
  }

  test("require throws a typed failure when no schema is registered (strict mode)") {
    val r = new SchemaRegistry
    val e = intercept[SchemaValidationException](r.require("/lake/raw/x.csv"))
    assert(e.getMessage.contains("no schema registered"))
  }
}
