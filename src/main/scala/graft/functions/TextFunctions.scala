package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, marker-based language ID, document
  * fingerprinting, and n-gram shingling.
  *
  * Everything is built from Catalyst higher-order / string functions —
  * codegen'd, shuffle-free, and embarrassingly parallel, so the same
  * column expressions run unchanged over 100 TB of documents. No UDFs.
  *
  * ANSI-safety: Spark 4 runs with ANSI mode on; all arithmetic here is
  * overflow-free (rolling hash works mod 1e9+7, divisions are guarded by
  * construction: token count >= 1 for non-empty text).
  */
object TextFunctions {

  /** Stopword markers present in the synthetic corpus vocabulary; real
    * deployments swap in per-language lists. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Documents are single-space token streams (FIXTURES.md B); a general
    * corpus would split on `\\s+`. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def hits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Mean token length without exploding: (chars - separators) / tokens. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text).cast("double")

  def stopwordRatio(text: Column): Column =
    hits(text, Stopwords).cast("double") / tokenCount(text).cast("double")

  /** Heuristic quality score in [0,1]: length prior + stopword prior +
    * token-shape prior. The exact weights matter less than the shape —
    * monotone, bounded, cheap, reproducible in any SQL engine. */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) * lit(0.5) +
      stopwordRatio(text) * lit(0.3) +
      least(avgTokenLen(text) / lit(10.0), lit(1.0)) * lit(0.2)

  /** Marker vocabularies for n-gram-style language ID. On the synthetic
    * corpus these are topic markers; on real text they'd be per-language
    * character n-grams / function words. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "db" -> Seq("data", "table", "row", "column"),
    "qy" -> Seq("query", "join", "filter", "sort"))

  /** Argmax over marker-hit scores, first-wins on ties (deterministic and
    * expressible identically in the DuckDB oracle). */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> hits(text, ms) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((label, score), i), els) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.foldLeft(lit(true))((acc, s2) => acc && score >= s2), label)
          .otherwise(els)
    }
  }

  private val FpPrime = 1000000007L

  /** Order-sensitive document fingerprint: polynomial rolling hash mod
    * 1e9+7, with each token hashed by the classic base-31 polynomial over
    * its code points. Fully specified arithmetic (no engine-private hash
    * function), so ANY engine can reproduce it — which is what a
    * fingerprint is for: cross-system identity checks. Every intermediate
    * stays < 2^40 (acc < 1e9+7, ×131 + char < 2^40) — no ANSI overflow. */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(131L) + stringHash(t), lit(FpPrime)))

  /** Base-31 polynomial over a string's code points, mod 1e9+7 (the
    * `java.lang.String.hashCode` recurrence on a prime field) — the
    * fully-specified portable hash shared by [[fingerprint]], the
    * winnowing fingerprints ([[graft.operators.Dedup.winnowedFingerprints]]),
    * and the MinHash/SimHash families (which need a hash any engine can
    * reproduce — the point of making dedup oracle-checkable). */
  def stringHash(t: Column): Column =
    CatalystBridge.column(StringPolyHash(CatalystBridge.expression(t)))

  /** All token hashes of a document in ONE fused pass: split on the
    * single-space separator and roll the [[stringHash]] polynomial per
    * token, emitting `array<long>` directly — no token strings
    * materialize, no per-token rows explode. Replaces the
    * explode + collect_list round-trip [[graft.operators.Dedup
    * .signatures]] used to keep the char loop out of HOF lambda bodies:
    * the minhash pipeline drops a whole corpus-token-scale shuffle.
    * Element-for-element equal to `transform(tokens(text), stringHash)`
    * including empty tokens from doubled/trailing separators
    * (`split`'s limit=-1 semantics), pinned in `StringPolyHashSpec`. */
  def tokenHashes(t: Column): Column =
    CatalystBridge.column(TokenHashes(CatalystBridge.expression(t)))

  /** Reference HOF formulation of [[stringHash]] — kept as the
    * differential oracle for the fused [[StringPolyHash]] codegen
    * expression (`StringPolyHashSpec`), which must match it value-for-
    * value on every string. */
  private[graft] def stringHashHof(t: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1)))),
      lit(0L),
      (a, c) => pmod(a * lit(31L) + c.cast("long"), lit(FpPrime)))

  /** n-token shingles as `array<string>` (space-joined). Documents
    * shorter than n shingle to empty.
    *
    * Built as n-1 `zip_with` passes against shifted copies of the token
    * array, NOT a per-window lambda: any expression referenced inside a
    * HOF lambda body re-evaluates once per element, so the obvious
    * `transform(…, i => slice(tokens(text), i+1, n))` re-runs the
    * `split` once per window. Here `tokens(text)` appears only as HOF
    * *arguments* (evaluated once per row); `zip_with` extends to the
    * longer input with nulls, and the final slice keeps exactly the
    * full-width windows. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    val joined = (1 until n).foldLeft(ts) { (acc, k) =>
      zip_with(acc, slice(ts, lit(k + 1), size(ts)), (a, b) => concat_ws(" ", a, b))
    }
    when(size(ts) >= n, slice(joined, lit(1), size(ts) - n + 1))
      .otherwise(array().cast(ArrayType(StringType)))
  }
}

/** `stringHash(string) -> bigint`: the portable base-31 polynomial
  * rolling hash `acc = (acc·31 + codepoint) mod 1e9+7` as ONE fused
  * codegen loop over the UTF-8 bytes. The HOF formulation
  * ([[TextFunctions.stringHashHof]]) materializes an index array, a
  * one-char UTF8String, and an interpreted lambda dispatch PER
  * CHARACTER — this sits under every minhash shingle, simhash token,
  * winnowing gram and sampling bucket, so it is the single hottest
  * scalar in the dedup/text families. Iterates by Unicode CODE POINT
  * (decoding UTF-8 inline, ASCII fast path) — exactly the
  * `ascii(substr(i,1))` semantics of the HOF and of the DuckDB oracles
  * that replay the hash, pinned value-for-value in
  * `StringPolyHashSpec`. */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    StringPolyHash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "string_poly_hash"
}

/** `shingleHashes(array<bigint>, width) -> array<bigint>`: rolling
  * base-131 window combines `((h_i·131 + h_{i+1})·131 + …) mod 1e9+7`
  * of `width` consecutive token hashes, fused into one loop. The HOF
  * form allocates a slice and dispatches an interpreted fold PER
  * WINDOW; this emits the whole shingle-hash array in one pass.
  * Arithmetic is identical (same fold order, same modulus), so the
  * dd02/dd04/dd08 oracles that replay shingle hashes still match —
  * pinned in `StringPolyHashSpec`. Inputs shorter than `width` yield
  * an empty array, matching the HOF's guard. */
case class ShingleHashCombine(child: Expression, width: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    StringPolyHash.shingleCombine(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringPolyHash.shingleCombine($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_combine"
}

/** `tokenHashes(string) -> array<bigint>` — see
  * [[TextFunctions.tokenHashes]]. */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    StringPolyHash.hashTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringPolyHash.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

object StringPolyHash {
  private val P = 1000000007L

  /** Rolling base-131 combine of every `width`-window — one loop over
    * the token-hash array (see [[ShingleHashCombine]]). */
  def shingleCombine(ths: org.apache.spark.sql.catalyst.util.ArrayData,
                     width: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = ths.numElements()
    if (n < width)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - width + 1)
    var j = 0
    while (j < out.length) {
      var a = 0L
      var k = 0
      while (k < width) { a = (a * 131L + ths.getLong(j + k)) % P; k += 1 }
      out(j) = a
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One pass: split on 0x20 (a single byte that never occurs inside a
    * multi-byte UTF-8 sequence) and roll the polynomial per segment.
    * Keeps empty segments — `split(text, " ")`'s limit=-1 semantics. */
  def hashTokens(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bs = s.getBytes
    var spaces = 0
    var i = 0
    while (i < bs.length) { if (bs(i) == 0x20) spaces += 1; i += 1 }
    val hashes = new Array[Long](spaces + 1)
    var acc = 0L
    var t = 0
    i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xFF
      if (b == 0x20) { hashes(t) = acc; t += 1; acc = 0L; i += 1 }
      else {
        var cp = 0
        var len = 0
        if (b < 0x80) { cp = b; len = 1 }
        else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
        else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
        else { cp = b & 0x07; len = 4 }
        if (i + len > bs.length) { i = bs.length } // malformed tail: stop
        else {
          var k = 1
          while (k < len) { cp = (cp << 6) | (bs(i + k) & 0x3F); k += 1 }
          acc = (acc * 31L + cp) % P
          i += len
        }
      }
    }
    hashes(t) = acc
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes)
  }

  /** Static so generated code calls one monomorphic site. Decodes the
    * UTF-8 code points inline; truncated trailing sequences (never
    * produced by Spark's validated UTF8Strings) terminate the loop
    * rather than reading out of bounds. */
  def hash(s: UTF8String): Long = {
    val bs = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xFF
      var cp = 0
      var len = 0
      if (b < 0x80) { cp = b; len = 1 }
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else { cp = b & 0x07; len = 4 }
      if (i + len > bs.length) return acc // malformed tail: stop
      var k = 1
      while (k < len) { cp = (cp << 6) | (bs(i + k) & 0x3F); k += 1 }
      acc = (acc * 31L + cp) % P
      i += len
    }
    acc
  }
}
