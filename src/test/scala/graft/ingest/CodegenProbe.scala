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
    spark.stop()
  }
}
