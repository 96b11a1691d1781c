package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for q91 (scratch; used to attribute the
  * query's wall time between candidate generation, the pair aggregate,
  * verification and the output sort).
  */
object Q91Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // warmup
    graft.SparkEntry.queries("q01_agg")(spark, sfDir).count()
    val parts = graft.queries.DedupSim.q91Parts(spark, sfDir)
    // toRdd.count, not count(): count() lets Catalyst drop the final
    // sort and collapse joins, which would hide exactly the output cost
    // this probe exists to attribute (see the Bench full-sweep note)
    for (_ <- 1 to 2)
      parts.foreach { case (name, df) => time(name)(df.queryExecution.toRdd.count()) }
    spark.stop()
  }
}
