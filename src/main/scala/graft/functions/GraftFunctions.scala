package graft.functions

import graft.ingest.WktNormalizeExpr
import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql` users get the same operators as the Column API:
  *
  *   SELECT wkt_normalize(line), cosine_similarity(a, b), ...
  *   SELECT g, top_k_by(score, id, 3) FROM t GROUP BY g
  *
  * Registration is per-session (temp functions), the idiomatic extension
  * point short of a SparkSessionExtensions build — and what a catalog
  * would do at startup. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("wkt_normalize",
      exprs => WktNormalizeExpr(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("string_poly_hash",
      exprs => StringPolyHash(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("token_hashes",
      exprs => TokenHashes(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("shingle_hashes",
      { exprs =>
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes width must be an integer literal, got $other")
        }
        ShingleHashCombine(exprs.head, w)
      }, "scala_udf")
    registry.createOrReplaceTempFunction("top_k_by",
      { exprs =>
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_k_by k must be an integer literal, got $other")
        }
        TopKOrderedAgg(exprs(0), exprs(1), k).toAggregateExpression()
      }, "scala_udf")
  }
}
