package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `rightTs <= leftTs` on the same key (pandas merge_asof / DuckDB
  * ASOF JOIN, inner semantics — unmatched left rows drop).
  *
  * Composed entirely from built-ins (preference (a) of the custom-op
  * ladder): tag both sides, UNION them, and carry the latest right
  * payload forward with `last(_, ignoreNulls) OVER (PARTITION BY key
  * ORDER BY ts, side ROWS UNBOUNDED PRECEDING)`. Right rows sort before
  * left rows at equal timestamps, giving `<=` semantics.
  *
  * Scale shape: ONE shuffle on the key and one sort — never the
  * per-key cartesian that a naive `rightTs <= leftTs` range join
  * produces. This is the classic log-merge layout: cost is
  * O((|L|+|R|) log) per partition, state is one carried payload row.
  * Ties among right rows at the same (key, ts) resolve arbitrarily —
  * add a tiebreak column to `rightTs` ordering upstream if the data
  * has them.
  */
object AsOfJoin {

  /** @param leftPayload  left columns to carry to the output
    * @param rightPayload right columns to emit from the matched row */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           leftPayload: Seq[String], rightPayload: Seq[String]): DataFrame = {
    val rCarry = rightPayload.map(c => s"__r_$c")
    val lSide = left.select(
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rSide = right.select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.union(rSide)
      .select(
        Seq(col(key), col("__ts"), col("__side")) ++
          leftPayload.map(col) ++
          rCarry.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    val matched: Column = rCarry.map(col(_).isNotNull).reduce(_ && _)
    carried
      .filter(col("__side") === 1 && matched) // left rows with a match (inner)
      .select(
        Seq(col(key), col("__ts").as(leftTs)) ++
          leftPayload.map(col) ++
          rightPayload.zip(rCarry).map { case (out, in) => col(in).as(out) }: _*)
  }
}
