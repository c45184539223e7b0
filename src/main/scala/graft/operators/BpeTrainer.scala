package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LEARNED BYTE-PAIR ENCODING — train a merge table FROM the corpus
  * (Sennrich et al. 2016's subword algorithm), the piece a real
  * training-data pipeline needs next to the fixed-rule tokenizer
  * (tx06): each round counts adjacent symbol pairs over the vocabulary
  * and merges the globally most frequent one.
  *
  * Scale shape — the reason this survives 100 TB of text:
  *
  *  - The corpus is touched ONCE, by the caller, to build the DISTINCT
  *    WORD frequency table (explode + one keyed agg). Zipf makes that
  *    table tiny relative to the corpus, and every training round
  *    operates on it alone.
  *  - Each round is exactly ONE keyed aggregation (pair → summed word
  *    count) over the cached vocabulary — the one-shuffle-per-round
  *    idiom of [[PageRank]] — followed by a `TakeOrdered(1)` for the
  *    arg-max. The ONLY driver materialization is that single top-pair
  *    row per round; the vocabulary never leaves the executors.
  *  - The merge is applied as a row-local string `replace` on the
  *    spaced symbol representation (no shuffle), and the new round's
  *    frame is cached while the previous is released.
  *
  * Determinism: ties break on (count DESC, left ASC, right ASC), and
  * the spaced-string representation + left-to-right non-overlapping
  * `replace` are shared SQL semantics — a relational engine (the
  * DuckDB oracle, tx21) replays the training bit-for-bit. */
object BpeTrainer {

  /** One learned merge: at `round`, (`left`, `right`) → `left+right`,
    * with the pair's corpus frequency at merge time. */
  case class Merge(round: Int, left: String, right: String, count: Long)

  /** Spaced symbol representation of the vocabulary: `" h  e  l  l  o "`
    * — every symbol carries its OWN leading and trailing space (one
    * sentinel at each end, TWO spaces between symbols), so adjacent
    * pair patterns `" a  b "` never share a delimiter character.
    * Sharing is the classic replace pitfall: with single spaces,
    * `" b a n a n a "` merging (a,n) consumes the shared space after
    * the first match and left-to-right scanning skips the second
    * occurrence — one pass would merge only every OTHER occurrence of
    * a consecutive run, deviating from Sennrich's merge-all-at-once
    * round. With per-symbol spaces one pass merges every occurrence. */
  private[operators] def symbolized(words: DataFrame): DataFrame =
    words.select(
      concat(lit(" "), concat_ws("  ", split(col("word"), "")), lit(" ")).as("sym"),
      col("cnt"))

  /** Adjacent-pair counts over the current vocabulary state — ONE keyed
    * aggregation (package-visible so the spec can pin the plan to a
    * single shuffle). */
  private[operators] def pairCounts(cur: DataFrame): DataFrame =
    cur.select(col("cnt"), split(trim(col("sym")), "  ").as("l"))
      .select(col("cnt"), explode(expr(
        "transform(slice(l, 1, size(l) - 1), " +
          "(x, i) -> struct(x AS a, element_at(l, i + 2) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** Train `rounds` merges over `words` — the distinct-word frequency
    * table `(word, cnt)`, NOT the raw corpus (build it with one
    * explode + groupBy; see tx21). Returns the merge table in learn
    * order; stops early if the vocabulary fully merges. */
  def train(words: DataFrame, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val merges = Seq.newBuilder[Merge]
    var cur = symbolized(words).cache()
    try {
      for (r <- 1 to rounds) {
        // arg-max via TakeOrdered(1): the single row that ever reaches
        // the driver
        val top = pairCounts(cur)
          .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
        if (top.isEmpty) return merges.result()
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, n)
        val next = cur.select(
          replace(col("sym"), lit(s" $a  $b "), lit(s" $a$b ")).as("sym"),
          col("cnt")).cache()
        next.count() // materialize before releasing the parent
        cur.unpersist()
        cur = next
      }
      merges.result()
    } finally cur.unpersist()
  }

  /** Apply a learned merge table to a token column: spaced chars, then
    * each merge's `replace` in learn order — row-local, no shuffle.
    * Returns the symbol count per input string (the "learned BPE token
    * count" a pipeline budgets samples by). */
  def tokenCount(tokens: org.apache.spark.sql.Column,
                 merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val spaced = concat(lit(" "), concat_ws("  ", split(tokens, "")), lit(" "))
    val merged = merges.foldLeft(spaced)((c, m) =>
      replace(c, lit(s" ${m.left}  ${m.right} "), lit(s" ${m.left}${m.right} ")))
    size(split(trim(merged), "  "))
  }
}
