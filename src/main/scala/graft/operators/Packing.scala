package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM pretraining: documents are concatenated in id
  * order within each stream key (e.g. language) and chopped into
  * fixed-token-budget bins. A document's bin is where its FIRST token
  * lands — documents may straddle a boundary, which is exactly the
  * concatenate-and-chop semantics of GPT-style packing (no padding, no
  * bin-packing search; deterministic, so shard N of the tokenized corpus
  * is reproducible run-over-run).
  *
  * Scale shape: one shuffle by the stream key, then a per-key window
  * cumulative sum — no global sort. Each key's group must fit a single
  * task's sort, so pick keys with bounded cardinality skew (lang ×
  * date, source shard, …); at 100 TB the stream key IS the shard key.
  * Bin arithmetic is done in DOUBLE: exact up to 2^53 tokens per key
  * (~9e15 — far beyond any single stream's size).
  */
object Packing {

  /** Adds `n_tokens` (whitespace token count), `tok_start` (tokens
    * preceding this doc in its key's stream) and `bin`
    * (= floor(tok_start / budget)) to `df`. */
  def assignBins(df: DataFrame, idCol: String, textCol: String,
                 keyCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", size(TF.tokens(col(textCol))).cast("long"))
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("tok_start") / lit(budget.toDouble)))
  }
}
