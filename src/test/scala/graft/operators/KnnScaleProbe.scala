package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: the batch kNN join on a 16x-amplified embedding corpus,
  * demonstrating the knob that keeps LSH candidate generation linear as
  * the corpus grows: BITS PER BAND. Bucket population ~ n / 2^bits, so
  * candidate pairs ~ bands * 2^bits * (n / 2^bits)^2 = bands * n^2 /
  * 2^bits — at 16x the corpus, adding 8 signature bits (16 -> 24 over 4
  * bands) restores the per-bucket population and keeps the pair count
  * in the same regime. That is exactly the tuning a 100 TB deployment
  * applies; recall stays governed by bands (unchanged).
  * Run: sbt "Test/runMain graft.operators.KnnScaleProbe <sfDir>" */
object KnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.embeddings(spark, args(0))
      .select(col("vec_id"), col("embedding"))
    // 16 variants per vector: copy i scales the vector by (1 + i/100) —
    // cosine-identical directions would all collide, so perturb one
    // component by the variant index instead
    val big = base.crossJoin(spark.range(0, 16).select(col("id").as("v")))
      .select((col("vec_id") * 100 + col("v")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("v"), size(col("embedding"))),
            x + col("v").cast("float") * lit(0.37f)).otherwise(x)).as("embedding"))
      .cache()
    println(s"PROBE| corpus=${big.count()} vectors")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE| $name rows=$n%d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    timed("knn 1x n=16bits")(Similarity.lshKnnJoin(base, k = 3).count())
    timed("knn 16x n=16bits (buckets 16x denser)")(
      Similarity.lshKnnJoin(big, k = 3).count())
    timed("knn 16x n=24bits (re-tuned: +8 bits restores bucket size)")(
      Similarity.lshKnnJoin(big, k = 3, nBits = 24, bands = 4).count())
    spark.stop()
  }
}
