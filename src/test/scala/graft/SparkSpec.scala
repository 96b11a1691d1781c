package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned planning for the eclipse-* DSv2 sources:
      // set at SESSION BIRTH everywhere queries run, so plan shapes never
      // depend on whether a fleet gate ran first (review finding)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Plan-text helpers for the shape-asserting specs. */
object PlanText {
  /** The FINAL adaptive plan only: AdaptiveSparkPlan's toString appends
    * the pre-reoptimization "Initial Plan", which may legitimately carry
    * exchanges AQE then removed — asserting on the full string would be
    * stricter than the property under test. ONE copy of the cut rule
    * (review finding: three hand-maintained copies had already diverged).
    */
  def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.indexOf("+- == Initial Plan ==") match {
      case -1 => plan
      case i => plan.substring(0, i)
    }
  }
}
