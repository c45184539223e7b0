package graft

import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for mm06's wall time. */
object Mm06Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"MM06| $what rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    time("mediaCorpus")(Multimodal.mediaCorpus(docs).count())
    time("extractFeatures")(
      Multimodal.extractFeatures(Multimodal.mediaCorpus(docs), dim = 64).count())
    val feats = Multimodal.extractFeatures(Multimodal.mediaCorpus(docs), dim = 64)
      .select(col("media_id").as("qid"), col("features").as("qvec")).cache()
    time("feats cache")(feats.count())
    time("knnAcross uncentered")(
      Similarity.lshKnnAcross(feats, emb, k = 3).count())
    time("knnAcross uncentered again")(
      Similarity.lshKnnAcross(feats, emb, k = 3).count())
    time("knnAcross centered")(
      Similarity.lshKnnAcross(feats, emb, k = 3, center = true).count())
    time("knnAcross centered again")(
      Similarity.lshKnnAcross(feats, emb, k = 3, center = true).count())
    // candidate-pair census: how many (band,bits) collisions feed the rescore?
    val qb = Similarity.debugBandedSignatures(
      feats.select(col("qid").as("vec_id"), col("qvec").as("embedding")), 16, 4, 42L)
      .select(col("vec_id").as("qid"), col("band"), col("band_bits"))
    val cb = Similarity.debugBandedSignatures(emb, 16, 4, 42L)
      .select(col("vec_id"), col("band"), col("band_bits"))
    time("pairs")(qb.join(cb, Seq("band", "band_bits"))
      .select(col("qid"), col("vec_id")).count())
    time("pairs distinct")(qb.join(cb, Seq("band", "band_bits"))
      .select(col("qid"), col("vec_id")).distinct().count())
    spark.stop()
  }
}
