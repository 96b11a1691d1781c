package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-heap stress for the summary read path: writes a synthetic
  * SMSPEC + UNSMRY of `nsteps` daily report steps × `nvec` well vectors
  * (one PARAMS record at a time on the write side), then runs the
  * streamed [[graft.write.SummaryWriter.readWithStep]] — one PARAMS
  * record in driver memory at a time, long-row expansion executor-side —
  * through a monthly resample, inside whatever heap the JVM was given.
  *
  * Usage: SPARK_DRIVER_MEM=2g runMain graft.tools.SummaryStress [nsteps] [nvec]
  * (defaults 5000 × 2000 = 10M values ≈ a large real UNSMRY)
  */
object SummaryStress {

  def main(args: Array[String]): Unit = {
    val nsteps = args.headOption.map(_.toInt).getOrElse(5000)
    val nvec = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-summary-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = s"/tmp/graft-summary-stress-$nsteps-$nvec/CASE"
    new java.io.File(base).getParentFile.mkdirs()

    val heapMb = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"heap=${heapMb}MB nsteps=$nsteps nvec=$nvec")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.io.EclKw
    import graft.io.EclKw.Kw
    timed("write SMSPEC+UNSMRY (one PARAMS record at a time)") {
      if (!new java.io.File(s"$base.UNSMRY").exists()) {
        val names = "TIME" +: (1 until nvec).map(i => s"WOPR")
        val wgs = ":+:+:+:+" +: (1 until nvec).map(i => s"W$i")
        EclKw.write(s"$base.SMSPEC", Seq(
          Kw("DIMENS", "INTE", Array(nvec, 0, 0, 0, 0, -1)),
          Kw("KEYWORDS", "CHAR", names.toArray),
          Kw("WGNAMES", "CHAR", wgs.toArray),
          Kw("NUMS", "INTE", Array.fill(nvec)(0)),
          Kw("UNITS", "CHAR", Array.fill(nvec)("")),
          Kw("STARTDAT", "INTE", Array(1, 1, 2000, 0, 0, 0))))
        val app = new java.io.FileOutputStream(s"$base.UNSMRY", true)
        try {
          val tmp = new java.io.File(s"$base.part")
          (0 until nsteps).foreach { s =>
            val params = Array.tabulate(nvec)(i =>
              if (i == 0) s.toFloat else ((s * 31 + i * 17) % 1000) * 0.5f)
            EclKw.write(tmp.getPath, Seq(
              Kw("SEQHDR", "INTE", Array(s)),
              Kw("MINISTEP", "INTE", Array(s)),
              Kw("PARAMS", "REAL", params)))
            java.nio.file.Files.copy(tmp.toPath, app)
          }
          tmp.delete()
        } finally app.close()
      }
      println(s"unsmry: ${new java.io.File(s"$base.UNSMRY").length() / (1 << 20)} MB")
    }

    val long = graft.write.SummaryWriter.readWithStep(spark, base)
    val n = timed("streamed read -> long count")(long.count())
    require(n == nsteps.toLong * (nvec - 1), s"expected ${nsteps.toLong * (nvec - 1)}, got $n")

    val monthly = timed("monthly resample over the long frame") {
      graft.modules.Summary.resample(long.drop("STEP"), "monthly").count()
    }
    println(s"monthly rows: $monthly")

    println(s"""{"metric":"summary_stress","nsteps":$nsteps,"nvec":$nvec,"heap_mb":$heapMb,"ok":true}""")
    spark.stop()
  }
}
