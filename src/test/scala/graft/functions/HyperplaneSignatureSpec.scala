package graft.functions

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused codegen LSH signature must equal the HOF reference
  * BIT-FOR-BIT on every vector — the ss-family oracles replay
  * signatures exactly, so any IEEE divergence is a correctness bug,
  * not a precision nit. */
class HyperplaneSignatureSpec extends AnyFunSuite with SparkTestSession {

  private def corpus(dim: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian() * 3).toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("fused signature == HOF signature on random vectors, several widths") {
    val ps = Similarity.planes(16, Similarity.MaxPlaneDim, seed = 42L)
    for (dim <- Seq(1, 7, 64, 384)) {
      val df = corpus(dim, 200)
        .withColumn("fused", Similarity.signature(col("embedding"), ps))
        .withColumn("hof", Similarity.signatureHof(col("embedding"), ps))
      assert(df.filter(col("fused") =!= col("hof")).count() === 0L,
        s"divergence at dim=$dim")
    }
  }

  test("array<double> inputs (centered vectors) agree with the HOF form too") {
    val ps = Similarity.planes(16, Similarity.MaxPlaneDim, seed = 42L)
    val df = corpus(64, 200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .withColumn("fused", Similarity.signature(col("embedding"), ps))
      .withColumn("hof", Similarity.signatureHof(col("embedding"), ps))
    assert(df.filter(col("fused") =!= col("hof")).count() === 0L)
  }

  test("edge vectors: zeros, negatives, empty") {
    import spark.implicits._
    val ps = Similarity.planes(8, 16, seed = 1L)
    val df = Seq(
      (1L, Seq.fill(16)(0f)),
      (2L, Seq.fill(16)(-1f)),
      (3L, Seq.empty[Float]),
      (4L, Seq(1f)) // shorter than the planes
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("fused", Similarity.signature(col("embedding"), ps))
      .withColumn("hof", Similarity.signatureHof(col("embedding"), ps))
    assert(df.filter(col("fused") =!= col("hof")).count() === 0L)
    // the all-zero and empty vectors sign every plane at +0.0 -> all bits
    assert(df.filter(col("vec_id") === 1L).select("fused")
      .collect().head.getLong(0) === 255L)
  }

  test("interpreted path (no codegen) agrees with codegen") {
    val ps = Similarity.planes(16, 64, seed = 5L)
    val df = corpus(32, 50)
    val fused = df.withColumn("s", Similarity.signature(col("embedding"), ps))
    val viaCodegen = fused.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = fused.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(interp === viaCodegen)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
