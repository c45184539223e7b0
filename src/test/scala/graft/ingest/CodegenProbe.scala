package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: run the custom expressions with codegen fallback DISABLED —
  * a silent CodegenFallback or janino compile error becomes fatal here.
  * Run: sbt "Test/runMain graft.ingest.CodegenProbe" */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wkt = Seq("1,MULTIPOLYGON (((-73.1 40.1, -73.2 40.2))),x")
      .toDF("value")
      .select(WktNormalizeExpr.wktNormalize(col("value")).as("v"))
      .collect()(0).getString(0)
    println(s"CODEGEN| wkt_normalize => $wkt")
    val cos = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosineFast(col("a"), col("b")).as("c"))
      .collect()(0).getDouble(0)
    println(s"CODEGEN| cosine_similarity => $cos")

    // SQL registration surface (still codegen-only mode)
    graft.functions.GraftFunctions.register(spark)
    val sqlWkt = spark.sql(
      "SELECT wkt_normalize('9,MULTIPOLYGON (((-73.5 40.5))),z') AS v").collect()(0).getString(0)
    println(s"SQL| wkt_normalize => $sqlWkt")
    Seq((1L, 5.0, 10L), (1L, 9.0, 3L), (1L, 1.0, 99L)).toDF("g", "s", "p")
      .createOrReplaceTempView("probe_t")
    val sqlTopK = spark.sql("SELECT top_k_by(s, p, 2) AS t FROM probe_t GROUP BY g")
      .collect()(0).getSeq[Long](0)
    println(s"SQL| top_k_by => $sqlTopK")
    spark.stop()
  }
}
