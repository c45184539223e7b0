package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests (seeded, 100 cases each) encoding the *intended*
  * validation semantics the reference's bugs obscured (SURVEY §1.3): a
  * header is valid iff it equals the manifest key sequence, positionally.
  * (Plain loops rather than ScalaCheck's scalatest bridge — only
  * scalatest + scalacheck core resolve in this offline environment.)
  */
class SchemaValidatorSpec extends AnyFunSuite {

  private def manifestOf(keys: Seq[String]) =
    SchemaManifest(keys.map(k => ManifestField(k, "string", partitionKey = false, "")))

  private def randomKeys(rnd: Random): List[String] = {
    val n = 2 + rnd.nextInt(12)
    List.tabulate(n)(i => s"col${i}_${rnd.alphanumeric.take(4).mkString}")
  }

  test("identity header validates (100 random manifests)") {
    val rnd = new Random(42)
    (1 to 100).foreach { _ =>
      val keys = randomKeys(rnd)
      val m = manifestOf(keys)
      assert(SchemaValidator.isValid(keys, m))
      SchemaValidator.assertValid(keys, m) // must not throw
    }
  }

  test("any true permutation is rejected") {
    val rnd = new Random(43)
    (1 to 100).foreach { _ =>
      val keys = randomKeys(rnd)
      val perm = rnd.shuffle(keys)
      if (perm != keys) {
        assert(!SchemaValidator.isValid(perm, manifestOf(keys)))
        assertThrows[SchemaValidationException](SchemaValidator.assertValid(perm, manifestOf(keys)))
      }
    }
  }

  test("dropping a column is an arity mismatch") {
    val rnd = new Random(44)
    (1 to 100).foreach { _ =>
      val keys = randomKeys(rnd)
      val e = intercept[SchemaValidationException](
        SchemaValidator.assertValid(keys.init, manifestOf(keys)))
      assert(e.getMessage.contains("arity"))
    }
  }

  test("renaming one column names the offending position") {
    val rnd = new Random(45)
    (1 to 100).foreach { _ =>
      val keys = randomKeys(rnd)
      val i = rnd.nextInt(keys.size)
      val renamed = keys.updated(i, keys(i) + "_x")
      val e = intercept[SchemaValidationException](
        SchemaValidator.assertValid(renamed, manifestOf(keys)))
      assert(e.getMessage.contains(s"field $i"))
    }
  }

  test("header split matches the reference's naive comma split, keeping empty trailing fields") {
    assert(SchemaValidator.headerFields("a,b,c") === Seq("a", "b", "c"))
    assert(SchemaValidator.headerFields("a,,c,") === Seq("a", "", "c", ""))
  }
}
