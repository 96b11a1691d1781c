package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("date-probe").toString
    (0 until 4).foreach { c =>
      val rows = for { (v, vi) <- Seq("FOPR", "FOPT").zipWithIndex; t <- 0 until 10 }
        yield (v, java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(t)), 10.0 * vi + t + c)
      graft.write.SummaryWriter.write(rows.toDF("VECTOR", "DATE", "VALUE"), s"$d/CASE$c")
    }
    (0 until 10).map(t => (java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(t)), t % 3))
      .toDF("DATE", "tag").write.mode("overwrite").parquet(s"$d/calendar")
    val fleet = spark.read.format("eclipse-unsmry").load(s"$d/*.UNSMRY")
    val dim = spark.read.parquet(s"$d/calendar").filter(col("tag") === 1)
    val joined = fleet.join(broadcast(dim), Seq("DATE")).groupBy(col("CASE")).agg(count(lit(1)).as("n"))
    joined.collect()
    println("=== FINAL PLAN ===")
    println(graft.PlanText.finalPlanOf(joined))
    spark.stop()
  }
}
