package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: stage-by-stage wall times for dd16's containment
  * pipeline, to attribute its cost (gram build vs hash vs join vs
  * verify). Run: sbt "Test/runMain graft.operators.ContainmentProbe <sfDir>" */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Dedup.augmentWithExcerpts(
      Tables.documents(spark, args(0)).select(col("doc_id"), col("text"))).cache()
    println(s"PROBE| docs=${docs.count()}")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE| $name n=$n%d wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val width = 8
    timed("tokens")(docs.select(size(TF.tokens(col("text"))).as("n"))
      .agg(sum(col("n"))).count())
    timed("shingles-count")(
      docs.select(explode(TF.shingles(col("text"), width)).as("gr")).count())
    timed("shingles-hash")(
      docs.select(explode(TF.shingles(col("text"), width)).as("gr"))
        .select(TF.stringHash(col("gr")).as("g")).agg(sum("g")).count())
    timed("gram-table-distinct")(
      docs.select(col("doc_id"), explode(TF.shingles(col("text"), width)).as("gr"))
        .select(col("doc_id"), TF.stringHash(col("gr")).as("g")).distinct().count())
    val elig = docs.filter(size(TF.tokens(col("text"))) >= width)
    val probes = elig.select(col("doc_id").as("contained_id"),
      TF.stringHash(
        element_at(TF.shingles(col("text"), width), 1)).as("g"))
    val grams = docs.select(col("doc_id").as("container_id"),
        explode(TF.shingles(col("text"), width)).as("gr"))
      .select(col("container_id"), TF.stringHash(col("gr")).as("g"))
      .distinct()
    timed("probes")(probes.count())
    val cand = probes.join(grams, "g")
      .filter(col("contained_id") =!= col("container_id"))
      .select(col("contained_id"), col("container_id")).distinct()
    println(cand.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    timed("candidates")(cand.count())
    val verified = cand
      .join(docs.select(col("doc_id").as("contained_id"),
        col("text").as("a_text")), "contained_id")
      .join(docs.select(col("doc_id").as("container_id"),
        col("text").as("b_text")), "container_id")
    timed("verify-join")(verified.count())
    timed("verify-contains")(verified
      .filter(contains(concat(lit(" "), col("b_text"), lit(" ")),
        concat(lit(" "), col("a_text"), lit(" ")))).count())
    timed("full")(Dedup.containmentDups(docs).count())
  }
}
