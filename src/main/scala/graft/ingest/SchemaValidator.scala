package graft.ingest

/** Typed failure for schema mismatches — the Spark analog of the
  * reference's `SchemaValidationException` (`CSVIngest.java:280-284`),
  * which is the only validation signal that actually aborts its pipeline
  * (`CSVIngest.java:273-274`). */
final class SchemaValidationException(msg: String) extends RuntimeException(msg)

/** Header-vs-manifest validation with the reference's *intended*
  * semantics: ordered, positional, name-equality of CSV header fields to
  * manifest keys (`CSVIngest.java:162-172`).
  *
  * The reference's implementation is buggy twice over (SURVEY §1.3): it
  * compares against an unordered HashSet and advances the set iterator
  * twice per header, so only half the manifest is ever checked, in
  * nondeterministic order. This implementation encodes the intent — and
  * the property tests pin it: a header validates iff it equals the
  * manifest's key sequence exactly.
  */
object SchemaValidator {

  /** Split a header line exactly like the reference does — a naive comma
    * split (`CSVIngest.java:151-152`). Correct for headers without quoted
    * commas; the promoted CSV path uses Spark's real CSV parser instead. */
  def headerFields(headerLine: String): Seq[String] =
    headerLine.split(",", -1).toSeq

  /** Advisory check (reference behavior: the boolean result is computed
    * and then ignored by the caller, `CSVIngest.java:237`). */
  def isValid(header: Seq[String], manifest: SchemaManifest): Boolean =
    header == manifest.keys

  /** Strict check: throws [[SchemaValidationException]] naming the first
    * offending position, like the reference's throw at
    * `CSVIngest.java:169` but deterministic. */
  def assertValid(header: Seq[String], manifest: SchemaManifest): Unit = {
    val keys = manifest.keys
    if (header.length != keys.length)
      throw new SchemaValidationException(
        s"arity mismatch: header has ${header.length} fields, manifest has ${keys.length}")
    header.lazyZip(keys).zipWithIndex.foreach { case ((h, k), i) =>
      if (h != k)
        throw new SchemaValidationException(
          s"field $i: header '$h' does not match manifest key '$k'")
    }
  }
}
