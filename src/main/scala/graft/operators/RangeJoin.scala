package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval (range) join.
  *
  * Spark plans `a.ts BETWEEN b.ts AND b.ts + w` as an equi-join on the
  * remaining keys with the range as a post-join filter — fine when the
  * equi key is selective, quadratic per key when it isn't (and fully
  * cartesian with no equi key). Binning restores an equi key from the
  * range itself: bucket timestamps into `window`-sized bins; a right row
  * can only match a left row whose bin is its own or the previous one,
  * so the left side probes bins {b, b+1} (a 2× fan-out, constant) and
  * the join runs on (key, bin) — bounded bucket sizes, no quadratic
  * blowup, AQE-splittable. This is the standard interval-join layout
  * used by stream processors (e.g. Flink's interval join state layout).
  */
object RangeJoin {

  /** Same-key event pairs (a, b) with `b.ts` in `[a.ts, a.ts + seconds]`
    * and `a.<idCol> < b.<idCol>`. Input needs columns: key, idCol, ts.
    * Output: a-side columns suffixed `_a`, b-side `_b`. */
  def pairsWithin(events: DataFrame, key: String, idCol: String,
                  tsCol: String, seconds: Int,
                  carryLeft: Seq[String] = Nil): DataFrame = {
    val winUs = seconds * 1000000L
    val withBin = events.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__bin", expr(s"__us div $winUs"))
    val probe = withBin.select(
      Seq(col(key).as("k_a"), col(idCol).as("id_a"), col("__us").as("us_a"),
        col(tsCol).as("ts_a"),
        explode(array(col("__bin"), col("__bin") + 1)).as("__bin")) ++
        carryLeft.map(c => col(c).as(s"${c}_a")): _*)
    val build = withBin.select(
      col(key).as("k_b"), col(idCol).as("id_b"), col("__us").as("us_b"),
      col(tsCol).as("ts_b"), col("__bin"))
    probe.join(build,
        col("k_a") === col("k_b") && probe("__bin") === build("__bin") &&
          col("id_a") < col("id_b") &&
          col("us_b") >= col("us_a") && col("us_b") <= col("us_a") + winUs)
      .drop("__bin", "us_a", "us_b", "k_b")
      .withColumnRenamed("k_a", key)
  }
}
