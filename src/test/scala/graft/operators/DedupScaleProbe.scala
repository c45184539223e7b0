package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: dedup pipelines on a 16x-replicated corpus (each doc gets
  * 15 perturbed near-copies — the heavy-duplication regime dedup exists
  * for). Watches wall time and pair counts for quadratic blowup.
  * Run: sbt "Test/runMain graft.operators.DedupScaleProbe <sfDir>" */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, args(0)).select(col("doc_id"), col("text"))
    // 16 variants per doc: copy i appends i marker tokens
    val big = base.crossJoin(
        spark.range(0, 16).select(col("id").as("variant")))
      .select((col("doc_id") * 100 + col("variant")).as("doc_id"),
        concat_ws(" ", col("text"),
          concat_ws(" ", array_repeat(concat(lit("v"), col("variant")), 2))).as("text"))
      .cache()
    println(s"PROBE| corpus=${big.count()} docs")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE| $name pairs=$n%d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    timed("minhash")(Dedup.minhashNearDups(big).count())
    timed("simhash")(Dedup.simhashNearDups(big).count())
    timed("ngram")(Dedup.ngramJaccardDups(big).count())
    // the composed cleaning pipeline (pl01's stages) on the 16x corpus:
    // all narrow maps + one fingerprint-keyed shuffle, so it must stay
    // near-linear where the pair-based dedups above grow with collisions
    timed("clean-pipeline") {
      import graft.functions.{TextFunctions => TF}
      val scored = big.select(col("doc_id"), col("text"),
        TF.qualityScore(col("text")).as("q"),
        TF.langId(col("text")).as("pred"),
        TF.fingerprint(col("text")).as("fp"))
      val kept = scored.filter(col("pred") =!= "en" && col("q") >= 0.35)
      val canon = kept.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      Sampling.hashSample(kept.join(canon, Seq("fp", "doc_id")), "doc_id", 0.7)
        .count()
    }
    spark.stop()
  }
}
