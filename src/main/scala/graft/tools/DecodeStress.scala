package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-heap stress for the binary decode path: writes a synthetic
  * INIT-shaped ecl_kw file of `ncells` (default 10⁷) active cells ×
  * `nvec` REAL vectors plus a table payload, then decodes it through
  * [[graft.io.EclBinary.init]] twice — full and selective — inside
  * whatever heap the JVM was given.
  *
  * Run with `SPARK_DRIVER_MEM=4g` to demonstrate the claim that the
  * un-boxed primitive-array decode handles 10⁷-cell artifacts in a fixed
  * 4 GB driver heap (boxed IndexedSeq[Any] storage needs ~20 bytes per
  * float element plus builder churn — 10⁷ × 7 vectors ≈ 1.5 GB+ of boxes
  * before the frame even assembles; flat float arrays need 280 MB total,
  * and the selective read decodes just one).
  *
  * Usage: SPARK_DRIVER_MEM=4g runMain graft.tools.DecodeStress [ncells] [nvec]
  */
object DecodeStress {

  def main(args: Array[String]): Unit = {
    val ncells = args.headOption.map(_.toInt).getOrElse(10000000)
    val nvec = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-decode-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"/tmp/graft-decode-stress-$ncells-$nvec.INIT"

    val heapMb = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"heap=${heapMb}MB ncells=$ncells nvec=$nvec")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("write") {
      import graft.io.EclKw
      val ih = Array.fill(95)(0)
      ih(8) = ncells; ih(9) = 1; ih(10) = 1; ih(11) = ncells
      ih(64) = 1; ih(65) = 1; ih(66) = 2000
      val out = new java.io.File(path)
      if (!out.exists() || out.length() == 0) {
        // one vector in memory at a time on the write side too
        EclKw.write(path, Seq(EclKw.Kw("INTEHEAD", "INTE", ih)))
        val app = new java.io.FileOutputStream(path, true)
        try {
          val tmp = new java.io.File(s"$path.part")
          (0 until nvec).foreach { v =>
            val data = Array.tabulate(ncells)(i => (i % 1000) * 0.001f + v)
            EclKw.write(tmp.getPath, Seq(EclKw.Kw(s"V$v", "REAL", data)))
            java.nio.file.Files.copy(tmp.toPath, app) // append
          }
          // a table payload the selective read must seek past
          EclKw.write(tmp.getPath,
            Seq(EclKw.Kw("TAB", "DOUB", Array.tabulate(2000000)(_.toDouble))))
          java.nio.file.Files.copy(tmp.toPath, app)
          tmp.delete()
        } finally app.close()
      }
      println(s"file: ${out.length() / (1 << 20)} MB")
    }

    val full = timed("decode all vectors + count") {
      graft.io.EclBinary.init(spark, path).count()
    }
    require(full == ncells, s"expected $ncells rows, got $full")

    val sel = timed("decode ONE vector (skip the rest) + count") {
      graft.io.EclBinary.init(spark, path, vectors = Seq("V1")).count()
    }
    require(sel == ncells, s"expected $ncells rows, got $sel")

    println(s"""{"metric":"decode_stress","ncells":$ncells,"nvec":$nvec,"heap_mb":$heapMb,"ok":true}""")
    spark.stop()
  }
}
