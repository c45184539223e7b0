package graft.ingest

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** External sidecar schema manifest → Spark [[StructType]].
  *
  * The reference stores schemas as JSON arrays of
  * `{key, type, partition_key, comment}` descriptors fetched separately
  * from the data and attached by object tag (`CSVIngest.java:88-100,
  * 126-145`; fixture `testSchema.json`). Two reference quirks are handled
  * deliberately:
  *
  *  - the fixture manifest is NOT a valid standalone JSON document (it
  *    begins with a bare `"schema": [` — `testSchema.json:1`); the
  *    reference swallows the ParseException and proceeds with an empty
  *    schema (`CSVIngest.java:139-140`). We instead repair the document by
  *    wrapping it in braces and parse it properly.
  *  - the manifest's `type` field is stored but never enforced by the
  *    reference (`CSVIngest.java:178,188-193`); here it maps to a real
  *    Spark DataType so the lake layer can promote columns (SURVEY §1.2).
  *
  * `partition_key=true` fields drive `df.write.partitionBy` in
  * [[CsvIngestJob.promote]] — the manifest field exists precisely to feed
  * partitioned lake layout (SURVEY §1.3), which is also the 100 TB story:
  * partition pruning on those columns is what keeps scans bounded.
  */
final case class ManifestField(key: String, typeName: String,
                               partitionKey: Boolean, comment: String) {
  def dataType: DataType = ManifestField.typeFor(typeName)
}

object ManifestField {
  /** Manifest `type` string → Spark DataType. The reference's fixtures
    * only ever say "string"; the latent fixture types (SURVEY §1.2) get
    * real mappings. Unknown names degrade to string, mirroring the
    * reference's everything-is-a-line model. */
  def typeFor(name: String): DataType = name.trim.toLowerCase match {
    case "int" | "integer"        => IntegerType
    case "long" | "bigint"        => LongType
    case "double" | "float8"      => DoubleType
    case "float"                  => FloatType
    case "boolean" | "bool"       => BooleanType
    case "date"                   => DateType
    case "timestamp" | "datetime" => TimestampType
    case "decimal"                => DecimalType(18, 4)
    case _                        => StringType
  }
}

final case class SchemaManifest(fields: Seq[ManifestField]) {
  def keys: Seq[String] = fields.map(_.key)

  def partitionColumns: Seq[String] = fields.filter(_.partitionKey).map(_.key)

  /** As a Spark schema; comment + partition_key ride along as field
    * metadata so nothing from the manifest is lost. */
  def toStructType: StructType = StructType(fields.map { f =>
    val md = new MetadataBuilder()
      .putString("comment", f.comment)
      .putBoolean("partition_key", f.partitionKey)
      .build()
    StructField(f.key, f.dataType, nullable = true, metadata = md)
  })
}

object SchemaManifest {

  /** Parse manifest JSON. Accepts the proper `{"schema":[...]}` form, a
    * bare JSON array, or the reference fixture's malformed bare
    * `"schema": [...]` form (repaired by brace-wrapping). Throws
    * [[SchemaValidationException]] on unparseable input — unlike the
    * reference, which silently proceeds with an empty schema
    * (`CSVIngest.java:139-144`). */
  def parse(text: String): SchemaManifest = {
    val trimmed = text.trim
    val repaired =
      if (trimmed.startsWith("{") || trimmed.startsWith("[")) trimmed
      else s"{$trimmed}" // reference fixture form: bare "schema": [ ... ]
    val json =
      try JsonMethods.parse(repaired)
      catch {
        case e: Exception =>
          throw new SchemaValidationException(s"unparseable schema manifest: ${e.getMessage}")
      }
    val arr = json match {
      case JObject(obj) =>
        obj.collectFirst { case ("schema", JArray(a)) => a }.getOrElse(
          throw new SchemaValidationException("manifest object has no \"schema\" array"))
      case JArray(a) => a
      case _ => throw new SchemaValidationException("manifest is neither object nor array")
    }
    val fields = arr.map {
      case JObject(o) =>
        val m = o.toMap
        def str(k: String): String = m.get(k) match {
          case Some(JString(v)) => v
          case Some(JBool(v))   => v.toString
          case _                => ""
        }
        val key = str("key")
        if (key.isEmpty)
          throw new SchemaValidationException("manifest element missing \"key\"")
        ManifestField(key, str("type"), str("partition_key").equalsIgnoreCase("true"), str("comment"))
      case other =>
        throw new SchemaValidationException(s"manifest element is not an object: $other")
    }
    SchemaManifest(fields)
  }
}
