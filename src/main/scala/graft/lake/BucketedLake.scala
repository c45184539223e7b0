package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed lake tables: pre-shuffled, co-located layout for the joins a
  * warehouse runs constantly (lineitem⋈orders on orderkey, fact⋈fact on
  * a shared key).
  *
  * Writing both sides bucketed by the join key into the same number of
  * buckets lets Spark plan the join with ZERO Exchange operators — at
  * 100 TB that deletes the single most expensive stage (an all-to-all
  * shuffle of the fact table) from every query that joins on the bucket
  * key. The write pays that shuffle once; every subsequent join rides it.
  * BucketedLakeSpec asserts the shuffle-free plan.
  */
object BucketedLake {

  /** Write `df` as a bucketed (and optionally sort-bucketed) catalog
    * table. Bucketing metadata lives in the session catalog — readers
    * must go through `spark.table(name)`. */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String,
                    numBuckets: Int, sortKey: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketKey)
    sortKey.fold(w)(k => w.sortBy(k)).saveAsTable(table)
  }

  /** Join two bucketed tables on their shared bucket key. When both
    * sides are bucketed into the same bucket count, the physical plan
    * contains no Exchange (verify with .explain). */
  def cocolocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
