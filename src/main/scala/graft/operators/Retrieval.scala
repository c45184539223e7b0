package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical + hybrid retrieval over the document corpus — the other half
  * of a RAG serving stack next to the vector ANN family
  * ([[Similarity]]): BM25 keyword scoring and reciprocal-rank fusion of
  * lexical and vector rankings.
  *
  * Everything is exact-replayable: BM25 is closed-form double
  * arithmetic over integer term statistics (no engine-specific
  * tokenizer state), and the per-document score folds its query-term
  * contributions in sorted term order, so the one non-associative step
  * (float addition) is order-pinned cross-engine.
  */
object Retrieval {

  /** BM25 scores (Robertson-Walker, the Lucene `1 + (N-df+0.5)/(df+0.5)`
    * idf that never goes negative) of every document against a bag of
    * query `terms`.
    *
    * Scale shape: doc lengths and term frequencies are one explode +
    * map-side-combinable counts; the query-term tf table is filtered
    * BEFORE its shuffle (|terms| × docs-containing rows, not corpus
    * tokens); df and the corpus stats broadcast. Nothing is ever
    * all-pairs, and adding query terms grows only the tiny broadcast
    * side — the inverted-index serving shape (tx10) with scoring
    * attached. */
  def bm25Scores(docs: DataFrame, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .join(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("tf") /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      // fold per-term contributions in sorted term order: float addition
      // is not associative, so the sum must be order-pinned for the
      // oracle (and for run-to-run determinism)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("term"), col("__s")))).as("__ts"))
      .select(col("doc_id"),
        round(aggregate(transform(col("__ts"), s => s.getField("__s")),
          lit(0.0), _ + _), 6).as("bm25"))
  }

  /** Top-k by BM25, ties on doc_id. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(docs, terms, k1, b)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse rankings by
    * `score(d) = Σ_r 1/(c + rank_r(d))` over the rankings that retrieved
    * d. Rank-based, so the two sides need no score normalization — the
    * standard hybrid (BM25 + vector) combiner. Each input is
    * (doc_id, rank) with ranks 1-based; `sources` labels pin the
    * contribution fold order. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val tagged = rankings.map { case (src, r) =>
      r.select(col("doc_id"), col("rank"), lit(src).as("__src"))
    }.reduce(_ unionByName _)
    tagged
      .withColumn("__contrib", lit(1.0) / (lit(c) + col("rank")))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("__src"), col("__contrib")))).as("__cs"))
      .select(col("doc_id"),
        round(aggregate(transform(col("__cs"), s => s.getField("__contrib")),
          lit(0.0), _ + _), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
