package graft.ingest

import org.apache.spark.sql.SparkSession

/** Dev driver: exercises the full ingest pipeline end-to-end against a
  * throwaway lake dir. Run: sbt "Test/runMain graft.ingest.IngestDemo <rawCsv> <workDir>" */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val Array(raw, work) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = SchemaManifest.parse(
      """{"schema":[
        |{"key":"OBJECTID","type":"int","partition_key":"false","comment":""},
        |{"key":"the_geom","type":"string","partition_key":"false","comment":""},
        |{"key":"BOROUGH","type":"string","partition_key":"true","comment":""},
        |{"key":"Shape_area","type":"double","partition_key":"false","comment":""}]}""".stripMargin)
    println("== massage: " + CsvIngestJob.massageFile(spark, raw, s"$work/processed",
      manifest = Some(m), singleFile = true))
    spark.read.textFile(s"$work/processed").collect().foreach(l => println("LINE| " + l))
    println("== normalize: " + CsvIngestJob.massageFile(spark, raw, s"$work/normalized",
      mode = IngestMode.NormalizeWkt, manifest = Some(m), singleFile = true))
    spark.read.textFile(s"$work/normalized").collect().foreach(l => println("NORM| " + l))
    println("== promote: " + CsvIngestJob.promote(spark, raw, s"$work/lake", m))
    spark.read.parquet(s"$work/lake").orderBy("OBJECTID").show(false)
    println("== pruned QN count: " + spark.read.parquet(s"$work/lake").where("BOROUGH='QN'").count())
    println("== badschema: " + CsvIngestJob.massageFile(spark, raw, s"$work/x",
      manifest = Some(SchemaManifest(m.fields.reverse))))
    println("== emptyfile: " + CsvIngestJob.massageFile(spark, s"$work/empty.csv", s"$work/y",
      manifest = Some(m)))
    println("== nomanifest: " + CsvIngestJob.massageFile(spark, raw, s"$work/z"))

    // quarantine channel: malformed typed values diverted, not nulled
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/dirty.csv"),
      "OBJECTID,the_geom,BOROUGH,Shape_area\n1,g,QN,1.5\nbad_id,g,BK,2.5\n3,g,SI,bad_area\n")
    println("== quarantine: " + CsvIngestJob.promote(spark, s"$work/dirty.csv",
      s"$work/lake2", m, Some(s"$work/bad")))
    println("QUAR| diverted=" + spark.read.parquet(s"$work/bad").count() +
      " clean=" + spark.read.parquet(s"$work/lake2").count())

    // schema registry: prefix-resolved manifests (the S3-tag analog)
    val reg = new SchemaRegistry
    reg.register(s"$work/", m)
    println("REG| resolved=" + reg.lookup(s"$work/dirty.csv").map(_.keys.mkString(",")))

    // observability: spans around executed queries
    val listener = graft.observability.QueryMetricsListener.attach(spark)
    spark.read.parquet(s"$work/lake2").count()
    Thread.sleep(500)
    println("SPANS| " + listener.snapshot().map(s => s"${s.name}:${s.succeeded}").mkString(" "))
    spark.stop()
  }
}
