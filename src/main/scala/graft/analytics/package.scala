package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, to_timestamp}

/** Shared query-building helpers for the analytics packages. */
package object analytics {

  /** Timestamp literal parsed in the session time zone (UTC everywhere in
    * this project) — matches the oracle's `TIMESTAMP '...'` literals. */
  private[analytics] def tsLit(sv: String): Column = to_timestamp(lit(sv))

  /** Cross-engine-stable 6-decimal rounding for doubles that are
    * IDENTICAL in both engines but may sit exactly on a rounding
    * boundary: floor(x*1e6+.5) is pure double arithmetic, unlike
    * round(), whose half-handling differs between Spark (decimal-string
    * HALF_UP) and DuckDB (numeric). Non-negative inputs only. */
  private[analytics] def stableRound6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
}
