package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wkt_normalize(line)` — the reference's intended WKT rewrite
  * (`CSVIngest.java:71-81`, SURVEY O5) as a single-pass custom Catalyst
  * expression: every `MULTIPOLYGON (((<coords>)))` block in the line is
  * rewritten to `x:y::x:y::...` (`, ` → `::`, ` ` → `:`, post-transform
  * empty ring `(:)` → `:::`).
  *
  * Semantics are bit-identical to [[LineMassager.normalizeWkt]]'s
  * regexp_replace chain (property-tested in WktNormalizeExprSpec); the
  * difference is cost: one character scan and one output builder vs four
  * regex engines per line. doGenCode stays inside whole-stage codegen by
  * emitting a static call — no Row boxing, no virtual dispatch.
  */
case class WktNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(WktNormalizeExpr.normalize(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.ingest.WktNormalizeExpr.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wkt_normalize"
}

object WktNormalizeExpr {

  def wktNormalize(line: Column): Column =
    CatalystBridge.column(WktNormalizeExpr(CatalystBridge.expression(line)))

  private final val Token = "MULTIPOLYGON ((("

  private def allowed(c: Char): Boolean =
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == ',' || c == ' ' ||
      c == '(' || c == ')'

  /** Java-regex-equivalent semantics of
    * `replaceAll("MULTIPOLYGON \(\(\([0-9\-\.\, \(\)]+\)\)\)", f(inner))`:
    * for each token occurrence, greedily take allowed chars and match up
    * to the LAST `)))` inside that run. Public (not private[ingest])
    * because generated code calls it. */
  def normalize(line: String): String = {
    val sb = new java.lang.StringBuilder(line.length)
    var from = 0
    var replaced = false
    var scanning = true
    while (scanning) {
      val at = line.indexOf(Token, from)
      if (at < 0) {
        sb.append(line, from, line.length)
        scanning = false
      } else {
        val innerStart = at + Token.length
        // maximal allowed-char run after "MULTIPOLYGON ((("
        var runEnd = innerStart
        while (runEnd < line.length && allowed(line.charAt(runEnd))) runEnd += 1
        // greedy regex semantics: LAST ")))" inside the run, non-empty inner
        val lastClose = line.lastIndexOf(")))", runEnd - 3)
        if (lastClose >= innerStart + 1) {
          sb.append(line, from, at)
          sb.append(transformInner(line.substring(innerStart, lastClose)))
          from = lastClose + 3
          replaced = true
        } else {
          // token without a closable block is literal text
          sb.append(line, from, innerStart)
          from = innerStart
        }
      }
    }
    if (replaced) sb.toString else line
  }

  /** `, ` → `::`, ` ` → `:`, then `(:)` → `:::`, after trim — the exact
    * replace order of the reference's dead-code path as reproduced by
    * LineMassager.normalizeWkt. */
  private def transformInner(inner: String): String = {
    val t = inner.trim
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == ',' && i + 1 < t.length && t.charAt(i + 1) == ' ') {
        sb.append("::"); i += 2
      } else if (c == ' ') {
        sb.append(':'); i += 1
      } else {
        sb.append(c); i += 1
      }
    }
    // post-transform empty-ring marker, all occurrences
    sb.toString.replace("(:)", ":::")
  }
}
