package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** FILTERED ANN ([[Similarity.probeIvfIndex]] with a `where`
  * pre-filter): the metadata predicate applies inside the probed cells
  * — pushed to the postings' parquet scan — so the result is the true
  * filtered top-k of the probed cells and never starves the way
  * post-filtering does. */
class FilteredAnnSpec extends AnyFunSuite with SparkTestSession {

  /** 90 deterministic unit-ish vectors in 3 clusters around axes, with
    * labels deliberately CORRELATED with the clusters so an unfiltered
    * neighborhood is dominated by one label. */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 90).map { i =>
      val axis = i % 3
      val base = Array.fill(6)(0.05f + rnd.nextFloat() * 0.1f)
      base(axis) = 1.0f
      (i.toLong, base.toSeq, axis) // label == cluster axis
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def buildIndex(): String = {
    val ix = Files.createTempDirectory("graft_fann").resolve("ivf").toString
    Similarity.buildIvfIndex(corpus, ix, nCells = 6, kmeansIters = 1)
    ix
  }

  private def query(): DataFrame =
    corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding"))

  test("probing every cell, the filtered probe equals the exact filtered brute-force top-k") {
    val ix = buildIndex()
    val got = Similarity.probeIvfIndex(spark, ix, query(), k = 5, nProbe = 6,
        where = Some(col("label") === 1))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // union the query row in so brute force can find it; its self-match
    // (cos = 1, always rank 1) is dropped — label 0 fails the filter
    val want = Similarity.bruteForceTopK(
        corpus.filter(col("label") === 1).unionByName(corpus.filter(col("vec_id") === 0L)),
        queryId = 0L, k = 6)
      .filter(col("vec_id") =!= 0L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.forall(_ % 3 == 1), "every result must satisfy the predicate")
  }

  test("pre-filter returns k results where post-filtering an unfiltered top-k starves") {
    val ix = buildIndex()
    // query 0 sits in cluster 0: its unfiltered top-10 is all label-0,
    // so post-filtering to label=1 yields (nearly) nothing...
    val postFiltered = Similarity.probeIvfIndex(spark, ix, query(), k = 10, nProbe = 6)
      .filter(col("vec_id") % 3 === 1)
    assert(postFiltered.count() < 5, "the unfiltered neighborhood is label-0-dominated")
    // ...while the pre-filter fills k from matching rows
    val preFiltered = Similarity.probeIvfIndex(spark, ix, query(), k = 10, nProbe = 6,
      where = Some(col("label") === 1))
    assert(preFiltered.count() === 10)
  }

  test("the metadata predicate pushes down to the postings parquet scan") {
    val ix = buildIndex()
    val df = Similarity.probeIvfIndex(spark, ix, query(), k = 5, nProbe = 2,
      where = Some(col("label") === 1))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,1"),
      s"label predicate must reach the parquet reader:\n$plan")
  }
}
