package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Line-level CSV massaging — the reference engine's transform kernel
  * re-expressed as Catalyst column expressions.
  *
  * Reference semantics (cited per SURVEY.md §2.1/§3.2):
  *  - O3 quote strip: every `"` character deleted
  *    (`CSVIngest.java:64-65`). Runs BEFORE any CSV tokenization, so it
  *    must stay a line-level (Dataset[String]) operation.
  *  - O4 geometry delete (the reference's *observable* behavior): the
  *    literal token `MULTIPOLYGON ` is removed, the line trimmed, and the
  *    whole `(((...)))` coordinate block (digits - . , space parens)
  *    deleted (`CSVIngest.java:67-68`).
  *  - O5 WKT normalize (the reference's *intended* behavior — dead code at
  *    `CSVIngest.java:71-81`, unreachable because O4 already deleted the
  *    token): coordinate block rewritten to `x:y::x:y::...` (`, ` → `::`,
  *    ` ` → `:`, empty ring `( )` → `:::`) and spliced back into the line.
  *
  * Both behaviors ship behind [[IngestMode]]; default = Actual (fidelity).
  *
  * Everything here is a chain of built-in `regexp_replace`/`translate`
  * expressions → whole-stage-codegen'd, pattern compiled once per task,
  * embarrassingly parallel (no shuffle) — the 100 TB path is just "more
  * input splits".
  */
object LineMassager {

  /** The reference's coordinate-block pattern (`CSVIngest.java:68`):
    * three literal open-parens, then digits/minus/dot/comma/space/parens,
    * then three close-parens. */
  private[ingest] val BlockPattern = "\\(\\(\\([0-9\\-\\.\\, \\(\\)]+\\)\\)\\)"

  /** O3 — strip every double-quote character. `translate` beats regex for
    * single-char deletion (no pattern engine in the inner loop). */
  def stripQuotes(line: Column): Column = translate(line, "\"", "")

  /** O4 — observable reference behavior: drop `MULTIPOLYGON ` token, trim,
    * delete the coordinate block. */
  def deleteGeometry(line: Column): Column =
    regexp_replace(
      trim(regexp_replace(line, "MULTIPOLYGON ", "")),
      BlockPattern, "")

  /** O5 — intended reference behavior: normalize the WKT block in place.
    * `MULTIPOLYGON (((x y, x y, ...)))` → `x:y::x:y::...` (first block;
    * empty ring → `:::`). Implemented with regexp_extract + replace chain
    * so the replacement can be a computed Column (DuckDB-style engines
    * need constant replacements; Spark's regexp_replace accepts a Column). */
  def normalizeWkt(line: Column): Column = {
    val full = "MULTIPOLYGON " + BlockPattern
    val inner = regexp_extract(line, "MULTIPOLYGON \\(\\(\\(([0-9\\-\\.\\, \\(\\)]+)\\)\\)\\)", 1)
    val norm =
      replace(replace(replace(trim(inner), lit(", "), lit("::")), lit(" "), lit(":")), lit("(:)"), lit(":::"))
    when(line.rlike(full), regexp_replace(line, lit(full), norm)).otherwise(line)
  }

  /** Full per-line massage for a mode. Quote strip always runs first
    * (order-sensitive: embedded commas in quoted geometry become bare,
    * which is safe only because the block is handled next — SURVEY §7.4). */
  def massage(line: Column, mode: IngestMode = IngestMode.Actual): Column = mode match {
    case IngestMode.Actual       => deleteGeometry(stripQuotes(line))
    case IngestMode.NormalizeWkt =>
      // intended path via the single-pass custom expression (bit-equal to
      // the regexp chain, WktNormalizeExprSpec), then drop any bare token
      // like the reference's final splice does (CSVIngest.java:79-80)
      trim(regexp_replace(WktNormalizeExpr.wktNormalize(stripQuotes(line)), "MULTIPOLYGON ", ""))
  }
}

/** Fidelity switch: Actual = the reference's observable output (geometry
  * deleted); NormalizeWkt = the reference's evident intent (geometry
  * normalized to `x:y::...`). SURVEY.md §7.4. */
sealed trait IngestMode
object IngestMode {
  case object Actual extends IngestMode
  case object NormalizeWkt extends IngestMode
}
