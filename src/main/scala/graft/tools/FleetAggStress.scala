package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fleet-scale evidence for the reported-partitioning plans (q189/q190
  * shape): writes `ncases` UNSMRY cases (`nsteps` × `nvec` values each),
  * runs the per-case rollup through the REGISTERED `eclipse-unsmry`
  * format twice — storage-partitioned planning ON vs OFF — and prints
  * wall time plus the hash-exchange count of each executed plan. The
  * claim under test: the scan's KeyGroupedPartitioning carries the
  * aggregate at ensemble scale, not just at the 4-case gate fixture.
  *
  * Usage: runMain graft.tools.FleetAggStress [ncases] [nsteps] [nvec]
  */
object FleetAggStress {
  def main(args: Array[String]): Unit = {
    val ncases = args.headOption.map(_.toInt).getOrElse(400)
    val nsteps = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val nvec = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-fleet-agg-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = s"/tmp/graft-fleet-agg-$ncases-$nsteps-$nvec"
    if (!new java.io.File(s"$dir/CASE0.UNSMRY").exists()) {
      new java.io.File(dir).mkdirs()
      println(s"-- writing $ncases cases x $nsteps steps x $nvec vectors")
      (0 until ncases).foreach { c =>
        val rows = for {
          vi <- 0 until nvec
          d <- 0 until nsteps
        } yield (s"V$vi", java.sql.Date.valueOf(
          java.time.LocalDate.of(2021, 1, 1).plusDays(d)),
          1000.0 * vi + d + 7.0 * c)
        graft.write.SummaryWriter.write(
          rows.toDF("VECTOR", "DATE", "VALUE"), s"$dir/CASE$c")
      }
    }

    def run(spj: Boolean): Unit = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      val df = spark.read.format("eclipse-unsmry").load(s"$dir/*.UNSMRY")
        .groupBy(col("CASE"))
        .agg(count(lit(1)).as("n"), sum(col("VALUE")).as("s"))
      val t0 = System.nanoTime()
      // collect THIS DataFrame (ncases rows) so the inspected plan is the
      // executed one — count() would run a separate QueryExecution and
      // leave df's adaptive plan unexecuted (review finding)
      val n = df.collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      val hashEx = "Exchange hashpartitioning".r
        .findAllIn(graft.PlanText.finalPlanOf(df)).length
      println(f"FLEETAGG spj=$spj cases=$n%d wall=${dt}%.2fs hash_exchanges=$hashEx")
    }
    // OFF first so the co-located run cannot ride its shuffle files
    run(spj = false)
    run(spj = true)

    // the VECTOR-pushdown half at the same fleet scale: one vector's
    // fleet series (the q190/q191 filter shape) with the slot path vs
    // the same semantic query with pushdown DEFEATED (filter on a
    // derived expression — not a pushable attribute filter), so the
    // kernels fully decode every PARAMS record and Spark post-filters
    def runVec(pushed: Boolean): Unit = {
      graft.io.DecodeStats.unsmryParams.reset()
      graft.io.DecodeStats.unsmryParamSlots.reset()
      val base = spark.read.format("eclipse-unsmry").load(s"$dir/*.UNSMRY")
      val df = if (pushed) base.where(col("VECTOR") === "V7")
        else base.where(concat(col("VECTOR"), lit("")) === lit("V7"))
      val t0 = System.nanoTime()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // bytes actually decoded from PARAMS payloads: full records carry
      // (nvec+1) floats each; the slot path reads 4 bytes per slot
      val full = graft.io.DecodeStats.unsmryParams.sum()
      val slots = graft.io.DecodeStats.unsmryParamSlots.sum()
      val bytes = full * (nvec + 1) * 4 + slots * 4
      println(f"FLEETVEC pushed=$pushed rows=$n%d wall=${dt}%.2fs " +
        f"params_full=$full slots=$slots payload_bytes=$bytes")
    }
    runVec(pushed = false)
    runVec(pushed = true)
    spark.stop()
  }
}
