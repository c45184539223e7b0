package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev driver: same-window A/B of the ss14 per-(anchor, band) hamming
  * candidate cap (VERDICT r15 #5). Times hardNegativesAuto with the
  * cap off (r15 behavior) vs the 4·k default, median of 3, at sf0.1
  * and the synthesized sf1 (run ScaleBench once first to materialize
  * /tmp/graft_sf1).
  *
  * Run: sbt "Test/runMain graft.operators.Ss14CapProbe"
  */
object Ss14CapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq("/root/testdata/sf0.1" -> "sf0.1", "/tmp/graft_sf1" -> "sf1").foreach {
      case (dir, tag) =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        emb.count() // warm cache
        Seq(0 -> "cap=off", -1 -> "cap=4k(12)").foreach { case (cap, label) =>
          val ts = (1 to 3).map { _ =>
            time(Similarity.hardNegativesAuto(emb, k = 3, targetBucket = 16,
              capPerBand = cap).count())
          }
          println(f"[ss14-cap] $tag%-6s $label%-12s median ${median(ts)}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
        }
    }
    spark.stop()
  }
}
