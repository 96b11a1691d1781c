package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned planning for the eclipse-* DSv2 sources:
      // set at SESSION BIRTH everywhere queries run, so plan shapes never
      // depend on whether a fleet gate ran first (review finding)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // checkpoint checksums off: measured r13 state-commit serialization
      // (see Bench.scala) — same setting everywhere queries run
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"===== $q =====")
      val plan = graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      // compress: keep operator lines only
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Broadcast") || l.contains("HashAggregate") ||
        l.contains("SortMergeJoin") || l.contains("WindowExec") || l.contains("Window") ||
        l.contains("Scan") || l.contains("Sort ") || l.contains("TakeOrdered"))
        .foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
