package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) corpus documents that
  * share n-gram shingles with an evaluation/benchmark set — the overlap
  * check every serious pretraining pipeline runs so test data does not
  * leak into training data.
  *
  * Scale shape: the eval set is tiny relative to the corpus (benchmarks
  * are thousands of documents; the corpus is the 100 TB side), so the
  * distinct eval shingle set is BROADCAST. The corpus side is one narrow
  * per-document shingle explode feeding a broadcast hash join and a
  * partial-aggregated count — corpus text is never shuffled, and no
  * corpus-×-eval pair space ever materializes beyond actual shingle
  * hits. With a larger eval side the same plan degrades gracefully to a
  * shuffled hash join on the shingle key.
  */
object Decontaminate {

  /** Per-corpus-document count of DISTINCT n-gram shingles shared with
    * `evalSet`: one row `(idCol, n_shared)` per document with at least
    * `minShared` overlapping shingles. Both sides deduplicate shingles
    * before the join, so `n_shared` is set-intersection cardinality —
    * repeating a leaked phrase doesn't inflate the score. */
  def overlaps(corpus: DataFrame, evalSet: DataFrame, idCol: String,
               textCol: String, n: Int = 3, minShared: Long = 1L): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val evalShingles = evalSet
      .select(explode(TF.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    corpus
      .select(col(idCol), explode(array_distinct(TF.shingles(col(textCol), n))).as("shingle"))
      .join(broadcast(evalShingles), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The corpus with contaminated documents removed (left-anti join
    * against [[overlaps]] on the id — broadcastable for real benchmark
    * sizes since only contaminated ids ship). */
  def clean(corpus: DataFrame, evalSet: DataFrame, idCol: String,
            textCol: String, n: Int = 3, minShared: Long = 1L): DataFrame =
    corpus.join(
      broadcast(overlaps(corpus, evalSet, idCol, textCol, n, minShared).select(col(idCol))),
      Seq(idCol), "left_anti")
}
