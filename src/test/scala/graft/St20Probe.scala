package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: phase decomposition of st20 (the bench's most expensive
  * build) — create+feed, IVF build, append, delete, upsert, stream
  * drain, probe — so the next optimization targets the measured phase,
  * not the famous one. Run:
  *   sbt "Test/runMain graft.St20Probe <sfDir>"
  */
object St20Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[st20-probe] $name%-36s ${ms(t0)}%8.1f ms")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.lake.TxnLake
    import graft.operators.Similarity
    import graft.streaming.IndexMaintenance

    (1 to 2).foreach { round =>
      println(s"== st20 phases, round $round ==")
      val root = java.nio.file.Files.createTempDirectory("graft_st20p")
      val dir = root.resolve("emb_lake").toString
      val ix = root.resolve("ivf").toString
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .filter(pmod(col("vec_id"), lit(2)) === 0)
      phase("create (changeFeed)") {
        TxnLake.create(spark, dir, e.filter(pmod(col("vec_id"), lit(5)) =!= 3),
          "label", changeFeed = true)
      }
      phase("buildIvfIndex") {
        Similarity.buildIvfIndex(
          TxnLake.read(spark, dir).select(col("vec_id"), col("embedding")),
          ix, nCells = 16, kmeansIters = 1)
      }
      phase("append") {
        TxnLake.append(spark, dir, e.filter(pmod(col("vec_id"), lit(5)) === 3))
      }
      phase("deleteWhere") {
        TxnLake.deleteWhere(spark, dir, pmod(col("vec_id"), lit(7)) === 2)
      }
      phase("upsert") {
        TxnLake.upsert(spark, dir,
          e.filter(pmod(col("vec_id"), lit(11)) === 0)
            .withColumn("embedding", transform(col("embedding"), x => -x)),
          "vec_id")
      }
      phase("stream drain (maintain)") {
        IndexMaintenance.maintain(spark, dir, ix,
            checkpointDir = root.resolve("ckpt").toString,
            startingVersion = Some(1L))
          .awaitTermination()
      }
      phase("probeIvfIndex + count") {
        Similarity.probeIvfIndex(spark, ix,
            e.filter(col("vec_id").isin(0L, 2L))
              .select(col("vec_id").as("qid"), col("embedding")),
            k = 10, nProbe = 4)
          .orderBy(col("qid"), col("cos").desc, col("vec_id")).count()
      }
    }
    spark.stop()
  }
}
