package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total ordering — global `row_number`/`ntile` without the
  * single-task `Window.orderBy(...)` plan (which moves EVERY row to one
  * partition and is the classic 100 TB scale-killer; see q20/q43's
  * demo-scale variants).
  *
  * Two-pass range-partitioned rank, the standard distributed algorithm:
  *  1. `repartitionByRange` on the sort key — each partition holds a
  *     contiguous, disjoint key range (Spark samples range bounds);
  *  2. local `row_number` inside each partition (parallel window, no
  *     global sort);
  *  3. per-partition row counts → running offsets. The offsets table is
  *     #partitions rows — metadata-scale — so its prefix-sum window and
  *     the broadcast join back are effectively free;
  *  4. global rank = partition offset + local rank.
  *
  * Cost: two data-sized shuffles (range + pid hash), both fully
  * parallel, vs one shuffle onto ONE task for the naive form. The sort
  * keys must include a unique tiebreaker for the rank to be
  * deterministic.
  */
object GlobalRank {

  /** Appends `rankCol` (1-based global row_number by `sortCols`). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "global_rank",
                     numPartitions: Int = 0): DataFrame =
    twoPass(df, sortCols, rankCol, numPartitions, row_number())

  /** Appends `rankCol` with `rank()` (ties share a rank, gaps follow)
    * semantics. Correct under the same two-pass scheme because the range
    * partitioner places EQUAL sort keys in one partition — a tie group
    * can never straddle a boundary, so local rank + row-count offset is
    * the global rank. */
  def withGlobalRankTies(df: DataFrame, sortCols: Seq[Column],
                         rankCol: String = "global_rank",
                         numPartitions: Int = 0): DataFrame =
    twoPass(df, sortCols, rankCol, numPartitions, rank())

  private def twoPass(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                      numPartitions: Int, localRank: => Column): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    // PIN one materialization of the range shuffle: the ranked branch and
    // the offsets branch below both consume it, and as two separate
    // DataFrame subtrees they would re-plan into two exchanges whose
    // SAMPLED range bounds can differ — offsets would then describe
    // different partitions than the ranks were computed in (observed:
    // silently wrong ranks). Round-tripping through the RDD makes both
    // branches scan the SAME shuffle output (stages dedup by RDD
    // identity), which is also how MPP engines run distributed rank:
    // pass 1 materializes, pass 2 reads.
    val frozen = ranged.sparkSession.createDataFrame(ranged.rdd, ranged.schema)
    val parted = frozen.withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lrn",
      localRank.over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
    // offsets: #partitions rows — the single-partition prefix-sum window
    // below runs over metadata, not data
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, (col("__off") + col("__lrn")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }

  /** Appends global rank plus its n-quantile bucket (ntile semantics:
    * first `total mod n` buckets get the extra row). Total count rides
    * the broadcast offsets table — no extra pass over the data.
    * `keepTotalAs` optionally retains the row count as a column so
    * callers deriving percent_rank don't re-scan the input. */
  def withGlobalNtile(df: DataFrame, sortCols: Seq[Column], n: Int,
                      rankCol: String = "global_rank",
                      tileCol: String = "tile",
                      keepTotalAs: Option[String] = None): DataFrame = {
    val ranked = withGlobalRank(df, sortCols, rankCol)
    val total = ranked.agg(count(lit(1)).as("__total"))
    // ntile(n): bucket sizes differ by at most 1, larger buckets first —
    // rank r (1-based) lands in bucket computed from quotient/remainder
    val q = floor(col("__total") / n)
    val r = col("__total") % n
    val cut = (q + 1) * r // ranks <= cut sit in the (q+1)-sized buckets
    val tiled = ranked.join(broadcast(total))
      .withColumn(tileCol,
        when(col(rankCol) <= cut, ceil(col(rankCol) / (q + 1)))
          .otherwise(r + ceil((col(rankCol) - cut) / greatest(q, lit(1))))
          .cast("int"))
    keepTotalAs match {
      case Some(name) => tiled.withColumnRenamed("__total", name)
      case None => tiled.drop("__total")
    }
  }
}
