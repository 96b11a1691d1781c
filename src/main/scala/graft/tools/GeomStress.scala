package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end geometry stress: writes a synthetic corner-point EGRID +
  * INIT at `ncells` (default 10⁷ = 500×200×100), then runs the FULL
  * binary→DataFrame→sink path — [[graft.io.EclBinary.egrid]] corner-point
  * kernels, [[graft.io.EclBinary.init]] vector decode,
  * [[graft.modules.GridOps.assemble]] active-ordinal join, a parquet sink,
  * and the CLI's streamed CSV sink — inside whatever heap the JVM was
  * given. [[DecodeStress]] proves the DECODE at 10⁷ cells; this proves the
  * whole reservoir-side pipeline at the same scale.
  *
  * Usage: SPARK_DRIVER_MEM=4g runMain graft.tools.GeomStress [nz]
  * (nx=500, ny=200 fixed; nz scales the cell count — nz=100 → 10⁷ cells)
  */
object GeomStress {

  def main(args: Array[String]): Unit = {
    val (nx, ny) = (500, 200)
    val nz = args.headOption.map(_.toInt).getOrElse(100)
    val ncells = nx * ny * nz
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-geom-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/graft-geom-stress-$ncells"
    new java.io.File(dir).mkdirs()

    val heapMb = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"heap=${heapMb}MB ncells=$ncells ($nx x $ny x $nz)")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.io.EclKw
    import graft.io.EclKw.Kw
    val egridPath = s"$dir/G.EGRID"
    val initPath = s"$dir/G.INIT"
    timed("write EGRID+INIT") {
      if (!new java.io.File(egridPath).exists()) {
        // straight 100m-spaced pillars, 10m layers from z=1000
        val coord = new Array[Float]((nx + 1) * (ny + 1) * 6)
        var p = 0
        for (j <- 0 to ny; i <- 0 to nx) {
          coord(p) = i * 100f; coord(p + 1) = j * 100f; coord(p + 2) = 1000f
          coord(p + 3) = i * 100f; coord(p + 4) = j * 100f; coord(p + 5) = 1000f + nz * 10f
          p += 6
        }
        val zcorn = new Array[Float](8 * ncells)
        val perSlab = 4 * nx * ny
        for (k <- 0 until nz) {
          java.util.Arrays.fill(zcorn, k * 2 * perSlab, k * 2 * perSlab + perSlab,
            1000f + k * 10f)
          java.util.Arrays.fill(zcorn, k * 2 * perSlab + perSlab, (k + 1) * 2 * perSlab,
            1000f + (k + 1) * 10f)
        }
        EclKw.write(egridPath, Seq(
          Kw("GRIDHEAD", "INTE", Array(0, nx, ny, nz)),
          Kw("COORD", "REAL", coord),
          Kw("ZCORN", "REAL", zcorn),
          Kw("ACTNUM", "INTE", Array.fill(ncells)(1))))
        val ih = Array.fill(95)(0)
        ih(8) = nx; ih(9) = ny; ih(10) = nz; ih(11) = ncells
        ih(64) = 1; ih(65) = 1; ih(66) = 2000
        EclKw.write(initPath, Seq(
          Kw("INTEHEAD", "INTE", ih),
          Kw("PORO", "REAL", Array.tabulate(ncells)(i => (i % 1000) * 0.0003f)),
          Kw("PERMX", "REAL", Array.tabulate(ncells)(i => (i % 500) * 1.5f))))
      }
      println(s"egrid: ${new java.io.File(egridPath).length() / (1 << 20)} MB, " +
        s"init: ${new java.io.File(initPath).length() / (1 << 20)} MB")
    }

    val parquetOut = s"$dir/grid.parquet"
    timed("egrid kernels + INIT decode + assemble -> parquet") {
      val geom = graft.io.EclBinary.egrid(spark, egridPath)
      val init = graft.io.EclBinary.init(spark, initPath)
      graft.modules.GridOps.assemble(geom, Some(init), None)
        .write.mode("overwrite").parquet(parquetOut)
    }
    val back = spark.read.parquet(parquetOut)
    val n = timed("parquet read-back count")(back.count())
    require(n == ncells, s"expected $ncells rows, got $n")

    val csvOut = s"$dir/grid.csv"
    timed("grid -> CSV (streamed single file, no driver collect)") {
      graft.cli.Res2Csv.writeCsvFile(back, csvOut)
    }
    val csvMb = new java.io.File(csvOut).length() / (1 << 20)
    println(s"csv: $csvMb MB")
    require(csvMb > 0, "empty CSV")

    println(s"""{"metric":"geom_stress","ncells":$ncells,"heap_mb":$heapMb,"csv_mb":$csvMb,"ok":true}""")
    spark.stop()
  }
}
