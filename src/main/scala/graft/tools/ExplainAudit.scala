package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan audit: prints the formatted physical plan of selected queries so
  * shuffle counts, broadcast choices, and parquet pushdown are reviewable.
  * `runMain graft.tools.ExplainAudit [queryName ...]` (default: a spread of
  * plan shapes).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg", "q02_join", "q04_asof", "q08_resample", "q25_jaccard")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("explain-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned planning for the eclipse-* DSv2 sources:
      // set at SESSION BIRTH everywhere queries run, so plan shapes never
      // depend on whether a fleet gate ran first (review finding)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // checkpoint checksums off: measured r13 state-commit serialization
      // (see Bench.scala) — same setting everywhere queries run
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
      println(s"-- exchanges=$exchanges (broadcast=$broadcasts)")
    }
    spark.stop()
  }
}
