package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Vector primitives over `array<float>` embedding columns.
  *
  * Two tiers:
  *  - [[VectorFunctions.cosine]]: pure higher-order-function composition
  *    (`zip_with` + `aggregate`) — no custom code, works on any Spark.
  *  - [[CosineSimilarity]]: a custom Catalyst `BinaryExpression` with
  *    `doGenCode` — a single fused loop over both float arrays (no
  *    intermediate zipped array, no per-element lambda dispatch). This is
  *    the hot-path form for 100 TB similarity scans: one pass, three
  *    accumulators, stays inside whole-stage codegen.
  *
  * Numerics: elements are widened float→double BEFORE multiplication in
  * both tiers, matching the DuckDB oracle's CAST(x AS DOUBLE)*CAST(y AS
  * DOUBLE) exactly (float×float rounding would diverge ~1e-7).
  */
object VectorFunctions {

  def toDoubleArray(a: Column): Column = a.cast(ArrayType(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArray(a), toDoubleArray(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** HOF cosine; returns 0.0 for zero-norm inputs instead of NaN. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Fused-loop codegen cosine (see [[CosineSimilarity]]). */
  def cosineFast(a: Column, b: Column): Column =
    CatalystBridge.column(CosineSimilarity(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Fused-loop codegen LSH signature (see [[HyperplaneSignature]]). */
  def hyperplaneSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    CatalystBridge.column(HyperplaneSignature(
      CatalystBridge.expression(vec), planes))
}

/** `signature(array<float>) -> bigint`: all `planes.length` hyperplane
  * dot products in ONE fused pass over the vector — bit p of the result
  * is sign(v · plane_p). The HOF formulation ([[graft.operators
  * .Similarity.signature]]'s original form) runs one transform+aggregate
  * per bit: 16 array allocations and 16 traversals per row; this is the
  * 100 TB form — one traversal, 16 accumulators, whole-stage codegen.
  *
  * IEEE-identical to the HOF form: each plane's accumulator adds
  * x_i·p_i in index order (the same left fold `aggregate` performs), so
  * the ss02/ss03 oracles that replay signatures bit-for-bit still
  * match. Components past a plane's length contribute zero, exactly
  * like the HOF's null-padding `coalesce`. */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
  extends UnaryExpression {

  // case-class params stay Seq (value equality drives plan canonical-
  // ization and cache reuse); codegen references the primitive matrix
  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var sig = 0L
    var p = 0
    while (p < matrix.length) {
      val pl = matrix(p)
      val m = math.min(n, pl.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        acc += (if (f) x.getFloat(i).toDouble else x.getDouble(i)) * pl(i)
        i += 1
      }
      if (acc >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mref = ctx.addReferenceObj("planes", matrix, "double[][]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val get = if (isFloat) s"((double) $c.getFloat" else s"($c.getDouble"
      s"""
         |int $n = $c.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < ${matrix.length}; $p++) {
         |  double[] $pl = $mref[$p];
         |  int $m = java.lang.Math.min($n, $pl.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += $get($i)) * $pl[$i];
         |  }
         |  if ($acc >= 0.0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_signature"
}

/** `cosine(array<float>, array<float>) -> double` as one codegen'd loop.
  * Evaluates dot, |a|², |b|² in a single pass; zero-norm → 0.0. If the
  * arrays differ in length the common prefix is scored (embedding tables
  * are fixed-width, so this is a defensive no-op in practice). */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
