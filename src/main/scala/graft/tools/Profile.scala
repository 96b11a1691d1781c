package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiler: runs each named query N times (default 3) against
  * SPARK_GRAFT_SF_DIR and prints every run's wall time, so plan/codegen
  * cost (run 1) separates from steady-state execution (runs 2+).
  *
  * Usage: runMain graft.tools.Profile q29_cosine_neardup q30_ann_lsh [n=3]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // run count as `n=5` or a bare trailing number; everything else is a
    // query name
    val (optArgs, names) =
      args.partition(a => a.startsWith("n=") || (a.nonEmpty && a.forall(_.isDigit)))
    val n = optArgs.headOption.map(_.stripPrefix("n=").toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned planning for the eclipse-* DSv2 sources:
      // set at SESSION BIRTH everywhere queries run, so plan shapes never
      // depend on whether a fleet gate ran first (review finding)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // checkpoint checksums off: measured r13 state-commit serialization
      // (see Bench.scala) — same setting everywhere queries run
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntryRef.queries("q01_agg")(spark, sfDir).count() // warmup
    catch { case _: Throwable => }

    import scala.jdk.CollectionConverters._
    def gcMillis: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    for (name <- names) {
      val fn = SparkEntryRef.queries(name)
      val times = (1 to n).map { _ =>
        val g0 = gcMillis
        val t0 = System.nanoTime()
        // GRAFT_PROFILE_FULL=1 executes the query's OWN physical plan to
        // the last row (toRdd.count) instead of count() — count() lets
        // Catalyst drop final sorts and prune columns, which can hide
        // real output cost for wide/sorted results
        val rows =
          if (sys.env.contains("GRAFT_PROFILE_FULL"))
            fn(spark, sfDir).queryExecution.toRdd.count()
          else fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // localCheckpoint blocks are RDD-level persists clearCache misses
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (dt, rows, gcMillis - g0)
      }
      println(f"PROFILE $name rows=${times.head._2} " +
        times.map(t => f"${t._1}%.3f/gc${t._3}ms").mkString("runs=[", ", ", "]"))
    }
    spark.stop()
  }

  private object SparkEntryRef {
    def queries = graft.SparkEntry.queries
  }
}
