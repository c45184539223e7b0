package graft.ingest

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Schema registry — the engine's replacement for the reference's
  * S3-object-tag schema discovery (O7, `CSVIngest.java:88-100`: tag
  * `SCHEMA_LOCATION` → `schemas/<value>` object).
  *
  * Tables (or raw-zone path prefixes) register a [[SchemaManifest]];
  * lookups resolve the most specific registered prefix, mirroring how
  * the tag attached a manifest to a data object. Conceptually this is
  * the broadcast side of a metadata join: at 100 TB the registry is a
  * handful of KB shipped to every task, never a per-file network fetch
  * like the reference's second S3 GET.
  *
  * Absence is tolerated (lookup → None), matching the reference's
  * swallowed NoSuchElementException (`CSVIngest.java:96-98`); callers
  * decide whether missing-schema is fatal (strict promote) or advisory
  * (massage-only), exactly like the reference's ignored boolean.
  */
final class SchemaRegistry {
  private val byPrefix = new ConcurrentHashMap[String, SchemaManifest]()

  def register(pathPrefix: String, manifest: SchemaManifest): Unit =
    byPrefix.put(pathPrefix, manifest)

  /** Longest-registered-prefix match for a data path. */
  def lookup(path: String): Option[SchemaManifest] =
    byPrefix.asScala
      .filter { case (p, _) => path.startsWith(p) }
      .toSeq.sortBy(-_._1.length)
      .headOption.map(_._2)

  /** Strict resolve: the analog of a thrown SchemaValidationException on
    * a missing manifest, for pipelines where schema is mandatory. */
  def require(path: String): SchemaManifest =
    lookup(path).getOrElse(
      throw new SchemaValidationException(s"no schema registered for path: $path"))
}
