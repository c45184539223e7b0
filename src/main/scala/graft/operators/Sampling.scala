package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys off a portable content-independent hash of the
  * document id ([[TextFunctions.stringHash]] of its decimal string, the
  * same fully-specified arithmetic the dedup oracles replay), NOT a
  * random generator: rates are exact filters over hash buckets, so
  *  - the same row lands in the same sample/split on every run, every
  *    engine, every cluster layout (Spark's `sample`/`sampleBy` are
  *    partition-layout-dependent and unreproducible after a repartition);
  *  - downstream joins against a sample are stable across reruns —
  *    the property training pipelines need for resumable jobs;
  *  - a DuckDB oracle recomputes membership exactly (sp01/sp02).
  *
  * Scale shape: one narrow hash + filter per row — no shuffle at all
  * for sampling; splitting adds a metadata-scale aggregate only when
  * counts are requested.
  */
object Sampling {

  /** Number of hash buckets rates are quantized to (rate resolution
    * 1/10000 = 0.01%). */
  val Buckets = 10000

  private val P = 1000000007L

  /** Quadratic-mix constants (seed 2000 of the shared splitmix-derived
    * family — disjoint from the minhash seeds 0..n and simhash seeds
    * 1000+k). Exposed so the sp01/sp02 oracles interpolate the exact
    * same literals. */
  private[graft] val MixConsts: (Long, Long, Long) = Dedup.seedConsts(2000)

  /** Uniform bucket in [0, Buckets) for a row id. The raw polynomial
    * hash of a SHORT decimal string is badly non-uniform modulo the
    * bucket count (3-digit ids land in one narrow hash range — measured
    * 60% survival at rate 0.3), so it goes through the same quadratic
    * mixing transform the minhash family uses before bucketing. */
  def bucketOf(id: Column): Column = {
    val (a, b, c) = MixConsts
    val h = TextFunctions.stringHash(id.cast("string"))
    pmod(pmod(lit(a) * pmod(h * h, lit(P)) + lit(b) * h + lit(c), lit(P)),
      lit(Buckets.toLong))
  }

  /** Keep each row whose id-bucket falls under `rate` (quantized to
    * 1/Buckets). Deterministic: the same ids survive every run. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(bucketOf(col(idCol)) < math.round(rate * Buckets))
  }

  /** Per-stratum rates (e.g. a target language mix): keep a row when
    * its id-bucket falls under its stratum's rate; strata absent from
    * `rates` are dropped. The rates map is tiny and becomes a literal
    * CASE expression — no join, still a narrow map. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1), s"rates must be in [0,1]: $rates")
    val cut = rates.foldLeft(lit(0L)) { case (els, (stratum, rate)) =>
      when(col(stratumCol) === stratum, lit(math.round(rate * Buckets))).otherwise(els)
    }
    df.filter(bucketOf(col(idCol)) < cut)
  }

  /** QUOTA CAP: keep at most `n` rows per stratum, chosen by the
    * deterministic hash priority ([[bucketOf]] asc, id asc) — the crawl
    * op "cap every domain at N pages": bias-free (priority is a uniform
    * seeded hash, not arrival or crawl order) and exactly reproducible
    * (sp10's DuckDB oracle replays the ranking).
    *
    * Scale shape — never one window task per raw stratum: phase 1 ranks
    * within (stratum, priority-bucket) — ≤ [[Buckets]] bounded
    * partitions per stratum — and prunes to local rank ≤ n (a row
    * outside its bucket's top-n cannot make the stratum's top-n, since
    * bucket is the leading sort key); phase 2 ranks the ≤ n·Buckets
    * survivors. A giant domain's skew lands on phase 2's BOUNDED input,
    * never the corpus. */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"n must be positive, got $n")
    val withP = df.withColumn("__q_p", bucketOf(col(idCol)))
    val local = Window.partitionBy(col(stratumCol), col("__q_p"))
      .orderBy(col(idCol))
    val pruned = withP.withColumn("__q_lr", row_number().over(local))
      .filter(col("__q_lr") <= n).drop("__q_lr")
    val global = Window.partitionBy(col(stratumCol))
      .orderBy(col("__q_p"), col(idCol))
    pruned.withColumn("__q_r", row_number().over(global))
      .filter(col("__q_r") <= n)
      .drop("__q_p", "__q_r")
  }

  /** Systematic PPS sampling (probability proportional to size, Madow's
    * systematic scheme): select ~`k` rows per stratum with inclusion
    * probability ∝ `weightCol`. Rows are laid on a weight line in the
    * deterministic hash-shuffled order ([[bucketOf]], ties by id); a row
    * is selected when its interval (cum−w, cum] contains a sampling
    * point t·W/k (t = 1..k) — evaluated as
    * `⌊cum·k/W⌋ > ⌊(cum−w)·k/W⌋` in pure BIGINT arithmetic, so a DuckDB
    * oracle replays the selection bit-for-bit (exact while W·k < 2^63 —
    * a 9·10^17-unit stratum at k=10, far past 100 TB of characters).
    * Exactly k rows per stratum when no single weight exceeds W/k; an
    * over-heavy row absorbs its extra points into one selection (the
    * standard PPS edge). Weights must be ≥ 0; zero-weight rows are
    * never selected.
    *
    * Scale shape — same discipline as [[tokenBudgetSample]], NOT one
    * cumsum window per stratum (that would stream each stratum through
    * a single task): (1) a partial-agg weight histogram per (stratum,
    * bucket) — ≤ |strata|·[[Buckets]] rows regardless of corpus size,
    * (2) bucket offsets + stratum totals from windows over that tiny
    * frame, (3) offsets join back and each row's global cumsum is
    * offset + a LOCAL window partitioned by (stratum, bucket) — 10000
    * bounded partitions per stratum instead of one unbounded one.
    * Integer addition is associative, so the decomposed cumsum equals
    * the straight-line one exactly. */
  def ppsSample(df: DataFrame, idCol: String, stratumCol: String,
                weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val wcol = col(weightCol).cast("long")
    val withB = df.withColumn("__pps_b", bucketOf(col(idCol)))
    val hist = withB.groupBy(col(stratumCol).as("__pps_s"), col("__pps_b").as("__pps_hb"))
      .agg(sum(wcol).as("__pps_bw"))
    val wOrd = Window.partitionBy(col("__pps_s")).orderBy(col("__pps_hb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = hist
      .withColumn("__pps_off", sum(col("__pps_bw")).over(wOrd) - col("__pps_bw"))
      .withColumn("__pps_tot",
        sum(col("__pps_bw")).over(Window.partitionBy(col("__pps_s"))))
      .select(col("__pps_s"), col("__pps_hb"), col("__pps_off"), col("__pps_tot"))
    val wLoc = Window.partitionBy(col(stratumCol), col("__pps_b"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(offs, col(stratumCol) <=> col("__pps_s") && col("__pps_b") === col("__pps_hb"))
      .withColumn("__pps_cum", col("__pps_off") + sum(wcol).over(wLoc))
      .withColumn("__pps_lo", col("__pps_cum") - wcol)
      .filter(expr(s"__pps_cum * ${k}L DIV __pps_tot") >
        expr(s"__pps_lo * ${k}L DIV __pps_tot"))
      .drop("__pps_b", "__pps_s", "__pps_hb", "__pps_off", "__pps_tot",
        "__pps_cum", "__pps_lo")
  }

  /** Token-budget mixture sampling ("data mixing"): per stratum (e.g.
    * source domain), keep a deterministic pseudo-random subset of rows
    * whose token count approximately meets that stratum's budget — the
    * op that turns a raw crawl into a target corpus mix.
    *
    * Selection is by hash-bucket prefix: rows land in [[Buckets]]
    * pseudo-random buckets (same portable mix as [[hashSample]]), and a
    * stratum keeps whole buckets in bucket order until the budget is
    * crossed (the first crossing bucket is kept, so coverage is
    * ≥ budget; resolution is stratum_tokens/[[Buckets]] per stratum).
    *
    * Scale shape — deliberately NOT a per-row window: a running cumsum
    * over rows would put each stratum's entire token stream through one
    * task. Instead (1) a partial-agg histogram of token counts per
    * (stratum, bucket) — bounded at |strata|×10000 rows no matter the
    * corpus size, (2) the cumsum window runs over that tiny frame,
    * (3) surviving (stratum, bucket) keys broadcast back as a semi-join
    * filter. Rows shuffle zero times; membership stays a pure function
    * of (id, stratum token histogram), reproducible cross-engine.
    *
    * `budget` is an expression over `stratumCol` (evaluated on the
    * histogram side), so callers can pass literal maps or derived
    * budgets without a join.
    *
    * NULL strata are a stratum like any other (the filter-back join is
    * null-safe `<=>`): they survive iff `budget` evaluates non-null
    * over a null stratum and the bucket's running total is under it —
    * a `when(...).otherwise(0)` budget therefore drops them, a
    * `coalesce(stratumCol, ...)`-keyed budget keeps them. Oracled as
    * sp04. */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
                        tokensCol: String, budget: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // namespaced temp columns; guard rather than silently clobber a
    // caller column of the same name
    require(!df.columns.exists(_.startsWith("__tbs_")),
      s"tokenBudgetSample reserves the __tbs_ column prefix; input has ${df.columns.mkString(",")}")
    val rows = df.withColumn("__tbs_bucket", bucketOf(col(idCol)))
    val hist = rows.groupBy(col(stratumCol), col("__tbs_bucket"))
      .agg(sum(col(tokensCol)).as("__tbs_btok"))
    val before = Window.partitionBy(col(stratumCol)).orderBy(col("__tbs_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = hist
      .withColumn("__tbs_before", coalesce(sum(col("__tbs_btok")).over(before), lit(0L)))
      .filter(col("__tbs_before") < budget)
      .select(col(stratumCol).as("__tbs_stratum"), col("__tbs_bucket").as("__tbs_kbucket"))
    rows.join(broadcast(kept),
        col(stratumCol) <=> col("__tbs_stratum")
          && col("__tbs_bucket") === col("__tbs_kbucket"))
      .drop("__tbs_stratum", "__tbs_kbucket", "__tbs_bucket")
  }

  /** Temperature-scaled mixture sampling (the multilingual rebalancing
    * trick from XLM-R / mC4): stratum l with n_l rows gets sampling
    * weight ∝ n_l^0.5 instead of n_l, up-weighting small strata. Keeps
    * `targetFrac` of the corpus overall. α is FIXED at 0.5 because
    * IEEE `sqrt` is correctly rounded in every engine while `pow` is
    * not — the one exponent where cross-engine bit-exactness is free.
    * All downstream math is integer (weights floor-scaled by 2^20,
    * budgets and per-stratum bucket thresholds via integer division),
    * so membership is a pure function of (id, stratum histogram) and
    * the sp05 oracle replays it exactly.
    *
    * Scale shape: the histogram is one partial-aggregated pass, the
    * per-stratum thresholds are a handful of rows broadcast back, the
    * filter is row-local — rows themselves never shuffle. */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        targetFrac: Double = 0.5): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, s"bad targetFrac $targetFrac")
    val stats = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__ts_n"))
    val th = temperatureCuts(stats, stratumCol, math.round(targetFrac * 1000000L))
    df.join(broadcast(th), col(stratumCol) <=> col("__ts_stratum"))
      .filter(bucketOf(col(idCol)) < col("__ts_cut"))
      .drop("__ts_stratum", "__ts_cut")
  }

  /** Per-stratum bucket cutoffs for [[temperatureSample]], from a
    * `(stratumCol, __ts_n)` histogram. Factored out so the integer
    * budget chain is testable against synthetic 100 TB-scale histograms
    * without materializing the rows.
    *
    * The chain `T_scaled * w_l` is ~ n^1.5 * 2^20 and overflows BIGINT
    * around 7e8 total rows with a dominant stratum, so every product
    * runs in DECIMAL(38,0) (exact to 38 digits in Spark and DuckDB
    * alike; `div` floors back to BIGINT). Worst realistic case —
    * total = 1e15 rows, one stratum — peaks at T_scaled * w ≈ 3.3e28,
    * 10 digits of headroom. */
  private[graft] def temperatureCuts(stats: DataFrame, stratumCol: String,
                                     scaledFrac: Long): DataFrame = {
    val weighted = stats.withColumn("__ts_w",
      floor(sqrt(col("__ts_n").cast("double")) * lit(1048576.0)).cast("long"))
    val tot = weighted.agg(sum(col("__ts_w")).as("__ts_sw"),
      sum(col("__ts_n")).as("__ts_total"))
    weighted.crossJoin(broadcast(tot))
      .select(col(stratumCol).as("__ts_stratum"),
        // budget_l = (T * w_l) div S with T = frac-scaled corpus size;
        // threshold = buckets * budget_l / n_l, capped at every bucket
        least(expr(
          s"""(CAST(10000 AS DECIMAL(38,0)) *
             |  ((((CAST(__ts_total AS DECIMAL(38,0)) * $scaledFrac) div 1000000)
             |    * CAST(__ts_w AS DECIMAL(38,0))) div __ts_sw))
             |div __ts_n""".stripMargin.replace('\n', ' ')),
          lit(10000L)).as("__ts_cut"))
  }

  /** Deterministic per-epoch shuffle key: a portable pseudo-random sort
    * key that is a pure function of (id, epoch), so ordering by it
    * gives each training epoch a DIFFERENT but fully reproducible
    * permutation of the corpus — the dataloader shuffle, minus the
    * nondeterminism. Seeds 2001+epoch of the shared splitmix-derived
    * quadratic family (sampling mix holds 2000). */
  def epochOrderKey(id: Column, epoch: Int): Column = {
    require(epoch >= 0 && epoch < 999, s"epoch must be in [0,999), got $epoch")
    val (a, b, c) = Dedup.seedConsts(2001 + epoch)
    val h = TextFunctions.stringHash(id.cast("string"))
    pmod(lit(a) * pmod(h * h, lit(P)) + lit(b) * h + lit(c), lit(P))
  }

  /** The corpus in epoch-`epoch` training order: globally sorted by
    * [[epochOrderKey]] (ties by id — keys collide at ~n²/P). A global
    * sort is exactly what Spark's range-partitioned exchange does well
    * at 100 TB; a downstream `limit(k)` collapses it further into a
    * distributed TakeOrdered with no full sort at all. */
  def epochShuffled(df: DataFrame, idCol: String, epoch: Int): DataFrame =
    df.orderBy(epochOrderKey(col(idCol), epoch), col(idCol))

  /** Train/val/test assignment by hash range: val gets the first
    * `valPct` buckets, test the next `testPct`, train the rest. Adds a
    * `split` column; membership is a pure function of the id. */
  def assignSplit(df: DataFrame, idCol: String,
                  valPct: Double = 0.05, testPct: Double = 0.05): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 1,
      s"invalid split percentages: val=$valPct test=$testPct")
    df.withColumn("split", splitOf(bucketOf(col(idCol)), valPct, testPct))
  }

  /** LEAKAGE-SAFE train/val/test split: like [[assignSplit]], but the
    * hash keys off each row's duplicate-cluster REPRESENTATIVE (min id
    * per content fingerprint) instead of the row id, so every copy of a
    * document lands in the SAME split. Splitting by row id leaks:
    * duplicates straddle train and val, and the eval score measures
    * memorization of training rows — the failure mode train/test
    * decontamination papers exist for. `fingerprint` is any content-key
    * expression: `md5(text)` for exact-dup safety, a minhash band or
    * cluster id from [[Dedup.clusters]] for near-dup safety.
    *
    * Scale shape: one keyed aggregation electing representatives
    * (narrow (fp, rep) rows) and one shuffle join back on the
    * fingerprint — no all-pairs, no corpus-wide window; the split
    * column itself is row-local hash math on the representative. */
  def leakageSafeSplit(df: DataFrame, idCol: String, fingerprint: Column,
                       valPct: Double = 0.05, testPct: Double = 0.05): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 1,
      s"invalid split percentages: val=$valPct test=$testPct")
    require(!df.columns.exists(_.startsWith("__lss_")),
      s"leakageSafeSplit reserves the __lss_ column prefix; input has ${df.columns.mkString(",")}")
    val withFp = df.withColumn("__lss_fp", fingerprint)
    val reps = withFp.groupBy(col("__lss_fp")).agg(min(col(idCol)).as("__lss_rep"))
    withFp.join(reps, "__lss_fp")
      .withColumn("split", splitOf(bucketOf(col("__lss_rep")), valPct, testPct))
      .drop("__lss_fp", "__lss_rep")
  }

  private def splitOf(bucket: Column, valPct: Double, testPct: Double): Column = {
    val valCut = math.round(valPct * Buckets)
    val testCut = valCut + math.round(testPct * Buckets)
    when(bucket < valCut, lit("val"))
      .when(bucket < testCut, lit("test"))
      .otherwise(lit("train"))
  }
}
