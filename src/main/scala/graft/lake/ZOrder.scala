package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering — the multi-dimensional data
  * layout trick behind Delta/Iceberg `ZORDER BY`: interleave the bits
  * of two sort dimensions so that range-partitioning on ONE key gives
  * locality in BOTH. A reader filtering on either dimension then skips
  * whole files on min/max zone maps, which at 100 TB is the difference
  * between scanning everything and scanning a few percent.
  *
  * The bit interleave is the classic mask-and-shift spread (each step
  * doubles the gap between payload bits), expressed as pure Catalyst
  * bitwise column math — codegen'd, row-local, zero shuffle, and exactly
  * reproducible in any engine with `<<`/`&`/`|` (the zq01 DuckDB oracle
  * replays it literally).
  */
object ZOrder {

  /** (shift, mask) ladder spreading 16 payload bits to even positions:
    * masks are 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555. */
  private val Spread: Seq[(Int, Long)] = Seq(
    (8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))

  /** Spread the low 16 bits of `v` to bit positions 0,2,4,…,30. */
  def spreadBits16(v: Column): Column =
    Spread.foldLeft(v.bitwiseAND(lit(65535L))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of two 16-bit coordinates: x on even bits, y on
    * odd. Monotone locality: points close in (x, y) land close on the
    * curve, so one range partitioner clusters both dimensions. */
  def mortonCode(x: Column, y: Column): Column =
    spreadBits16(x.cast("bigint"))
      .bitwiseOR(shiftleft(spreadBits16(y.cast("bigint")), 1))

  /** N-WAY Morton interleave (Delta's `ZORDER BY (a, b, c, …)`): bit i
    * of dimension j lands at output position `i*n + j`, each dimension
    * contributing the low `63/n` bits (21 at n=3, 15 at n=4) of one
    * 64-bit curve key. Expressed as a fold of shift/mask column ops —
    * row-local, codegen'd, replayable in any engine with `<<`/`&`/`|`.
    * The 2-D fast path stays [[mortonCode]] (its 16-bit ladder is what
    * the zq01 oracle replays literally); this general form serves
    * [[graft.lake.TxnLake.optimizeZOrder]] beyond two dimensions.
    *
    * Deliberate tradeoff: the per-bit fold is O(bits) terms per
    * dimension (~63 OR'd ops at n=3) where a stride-n mask ladder
    * would be O(log bits) — but the key is computed once per row on
    * the REWRITE path, which parquet encode/IO dominates by orders of
    * magnitude (zq08's whole re-cluster commit measures ~1 s at
    * sf0.01), and the fold is trivially replayable/auditable. Revisit
    * only if a profile ever shows key computation on top. */
  def mortonCodeN(dims: Seq[Column]): Column = {
    val n = dims.size
    require(n >= 2 && n <= 6, s"morton interleave supports 2..6 dimensions, got $n")
    val bits = 63 / n
    val terms = for {
      (c, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("bigint"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The payload bits per dimension [[mortonCodeN]] keeps. */
  def bitsPerDim(n: Int): Int = 63 / n

  /** Write `df` parquet z-ordered on (xCol, yCol): range-partition on
    * the Morton key into `numFiles` files, sort within each. Files get
    * DISJOINT Morton ranges (range partitioner) — so parquet min/max
    * stats on a persisted `zkey` column prune files for 2-D box
    * predicates. One full shuffle, same cost as any global sort; the
    * key stays in the file as `zkey` because zone-map skipping needs a
    * real column, not a transient sort key. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    numFiles: Int, path: String): Unit =
    df.withColumn("zkey", mortonCode(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
}
