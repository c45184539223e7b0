package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev diagnostic: times each phase of the dd07 pipeline (pair
  * generation, label init, every propagation round un-batched) so the
  * round structure behind [[graft.operators.Dedup.clusters]]'s batching
  * choice stays measurable.
  * Usage: sbt "Test/runMain graft.ClusterProbe <sfDir>" */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("CLPROBE_AQE_CACHE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CLPROBE| $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val aug = Dedup.augmentWithNearDups(docs)
    val pairs = t("pairs (ngramJaccardDups)") {
      val p = Dedup.ngramJaccardDups(aug).cache(); p.count(); p
    }
    // replicate clusters() round structure with per-round timing
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = t("init labels (distinct)") {
      val l = edges.select(col("src").as("doc_id"))
        .distinct().withColumn("cluster_id", col("doc_id")).cache()
      l.count(); l
    }
    t("job floor: labels.count")(labels.count())
    t("job floor: labels.count 2")(labels.count())
    var iter = 0; var converged = false
    while (iter < 10 && !converged) {
      val changed = t(s"round ${iter + 1}") {
        val viaNeighbors = edges
          .join(labels.withColumnRenamed("doc_id", "src"), "src")
          .select(col("dst").as("doc_id"), col("cluster_id"),
            lit(null).cast("long").as("old"))
        val own = labels.select(col("doc_id"), col("cluster_id"),
          col("cluster_id").cast("long").as("old"))
        val next = own.union(viaNeighbors)
          .groupBy(col("doc_id"))
          .agg(min(col("cluster_id")).as("cluster_id"), min(col("old")).as("old"))
          .cache()
        val c = next.filter(col("cluster_id") =!= col("old")).count()
        labels = next.select(col("doc_id"), col("cluster_id"))
        c
      }
      println(s"CLPROBE|   changed=$changed")
      converged = changed == 0
      iter += 1
    }
    spark.stop()
  }
}
