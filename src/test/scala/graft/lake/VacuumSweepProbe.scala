package graft.lake

import org.apache.spark.sql.SparkSession

/** Dev driver: VACUUM SWEEP scaling (VERDICT r17 #4). The sweep's cost
  * at 100 TB is dominated by per-file metadata RPCs (list + delete on
  * an object store); a driver loop issues them one at a time, the
  * Spark-job sweep issues them from every executor. This probe builds
  * a synthetic `_graft_data` layout (commit dirs × files, most
  * unreferenced) and times the sequential loop vs
  * [[TxnLake.sweepDataDirsDistributed]] on identical twins.
  *
  * Local-fs deletes are ~free, so wall ratios here UNDERSTATE the
  * object-store win — the probe's point is that the distributed path
  * is correct (same survivor set) and already at parity locally, while
  * scaling with executors rather than file count on the driver.
  *
  * Run: sbt "Test/runMain graft.lake.VacuumSweepProbe [dirs] [filesPerDir]"
  */
object VacuumSweepProbe {
  def main(args: Array[String]): Unit = {
    val nDirs = if (args.length > 0) args(0).toInt else 256
    val perDir = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(tag: String): (String, Set[String]) = {
      val root = java.nio.file.Files.createTempDirectory(s"graft_vsp_$tag")
        .resolve("t")
      val dataRoot = root.resolve("_graft_data")
      java.nio.file.Files.createDirectories(dataRoot)
      val referenced = Set.newBuilder[String]
      (0 until nDirs).foreach { d =>
        val cdir = dataRoot.resolve(f"c$d%08d")
        java.nio.file.Files.createDirectory(cdir)
        (0 until perDir).foreach { f =>
          val name = f"part-$f%05d.parquet"
          java.nio.file.Files.write(cdir.resolve(name), Array[Byte](1))
          // every 8th file stays referenced (a live snapshot survivor)
          if (f % 8 == 0) referenced += f"_graft_data/c$d%08d/$name"
        }
      }
      (root.toString, referenced.result())
    }
    def countFiles(root: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "_graft_data"))
      try s.filter(java.nio.file.Files.isRegularFile(_)).count() finally s.close()
    }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // sequential twin — the pre-r18 driver loop, verbatim semantics
    val (seqRoot, seqRef) = build("seq")
    val fs = TxnLake.fsOf(spark, seqRoot)
    val cutoff = System.currentTimeMillis() + 1000 // everything eligible
    var t0 = System.nanoTime()
    val dataRoot = new org.apache.hadoop.fs.Path(seqRoot, "_graft_data")
    fs.listStatus(dataRoot).foreach { cdir =>
      val it = fs.listFiles(cdir.getPath, true)
      while (it.hasNext) {
        val f = it.next()
        val rel = TxnLake.dataRel(f.getPath.toUri.getPath)
        if (!seqRef.contains(rel) && f.getModificationTime < cutoff)
          fs.delete(f.getPath, false)
      }
    }
    val seqMs = ms(t0)
    require(countFiles(seqRoot) == seqRef.size, "sequential sweep survivor mismatch")

    // distributed twin
    val (parRoot, parRef) = build("par")
    val parDirs = TxnLake.fsOf(spark, parRoot)
      .listStatus(new org.apache.hadoop.fs.Path(parRoot, "_graft_data"))
      .map(_.getPath.toString).toSeq
    val cutoff2 = System.currentTimeMillis() + 1000 // par twin built after cutoff
    t0 = System.nanoTime()
    TxnLake.sweepDataDirsDistributed(spark, parDirs, parRef, cutoff2)
    val parMs = ms(t0)
    if (countFiles(parRoot) != parRef.size) {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(parRoot, "_graft_data"))
      val left = try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(_.toString).take(5).toList
      } finally walk.close()
      println(s"[debug] survivors=${countFiles(parRoot)} expected=${parRef.size} sample=$left")
      println(s"[debug] ref sample=${parRef.take(3)}")
      require(false, "distributed sweep survivor mismatch")
    }

    val total = nDirs.toLong * perDir
    println(f"[vacuum-sweep] $nDirs dirs x $perDir files ($total total, " +
      f"${total - seqRef.size} deleted): sequential $seqMs%8.1f ms | " +
      f"spark-job $parMs%8.1f ms | identical survivor sets")
    spark.stop()
  }
}
