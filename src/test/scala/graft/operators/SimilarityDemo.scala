package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: near-dup recall of banded cosineNearDups on perturbed
  * (not identical) planted duplicates.
  * Run: sbt "Test/runMain graft.operators.SimilarityDemo <sfDir>" */
object SimilarityDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, args(0))
    val perturbed = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, CAST(x + 0.05 AS FLOAT), x))").as("embedding"))
    val aug = emb.select(col("vec_id"), col("embedding")).union(perturbed)
    val dups = Similarity.cosineNearDups(aug, threshold = 0.98)
    val planted = dups.filter(col("vec_b") === col("vec_a") + 2000000L)
    println(s"NEARDUP| recalled=${planted.count()}/50 totalPairs=${dups.count()}")
    planted.orderBy(col("vec_a")).limit(3).collect()
      .foreach(r => println(s"NEARDUP| ${r.getLong(0)} ~ ${r.getLong(1)} cos=${r.getDouble(2)}"))

    // multimodal resize + frame sampling through the public API
    val media = Multimodal.mediaCorpus(Tables.documents(spark, args(0)))
    val frames = Multimodal.sampleFrames(media)
    frames.orderBy("media_id").limit(2).collect().foreach(r =>
      println(s"FRAMES| id=${r.getLong(0)} fmt=${r.getString(1)} " +
        s"n=${r.getInt(2)} sampled=${r.getInt(3)} crc=${r.getLong(4)}"))
    val resized = Multimodal.resize(media, targetBytes = 16)
    val over = resized.filter(length(col("resized")) > 16).count()
    println(s"RESIZE| rows=${resized.count()} over_budget=$over")
    spark.stop()
  }
}
