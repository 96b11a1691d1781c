package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Segment-level decomposition of the suffix kernel at SPARK_GRAFT_SF_DIR:
  * row counts and timings of each persisted intermediate, so optimization
  * targets the stage that actually costs (round-13 measurement aid).
  */
object SuffixProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("suffix-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sufprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.queries.TextAnalytics
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    // warmup the whole query once
    t("q203 full (warm)")(TextAnalytics.suffixRepeats(docs).count())
    t("q203 full (steady)")(TextAnalytics.suffixRepeats(docs).count())
    // decompose via the probe hook
    val (d, occ, cleanup) = TextAnalytics.suffixOccProbe(docs)
    t("docs count")(println("  docs=" + d.count()))
    t("occ count")(println("  occ=" + occ.count()))
    t("occ reagg")(println("  intervals=" +
      occ.groupBy(col("v"), col("lo"), col("hi")).count().count()))
    cleanup()
    spark.stop()
  }
}
