package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A shuffle join hashes rows to partitions by key; one hot key (the
  * null user, the default product, the empty document) lands an entire
  * partition on one task. Salting splits each hot key into `salts`
  * sub-keys: the big side picks a pseudo-random salt per row, the small
  * side is replicated once per salt, and the join key becomes
  * (key, salt) — the hot key's rows spread over `salts` tasks.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins
  * after the fact; explicit salting remains the tool when the skew is
  * known ahead of time, when the join is hash-based, or when AQE's
  * split thresholds don't trigger. Result is exactly the plain join's
  * result (SkewJoinSpec asserts equality).
  */
object SkewJoin {

  /** Deterministic per-row salt: hash of the whole row modulo `salts`.
    * Using row content (not rand()) keeps retries/speculative tasks
    * consistent. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** Inner-join `big` (skewed side) with `small` on `key`, spreading
    * each key over `salts` partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", rowSalt(big, salts))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }
}
