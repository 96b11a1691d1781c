package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketing evidence for the 100 TB story: the same fact⋈fact join and
  * aggregate, once over plain parquet (both sides shuffle into the join)
  * and once over tables bucketed + sorted on the join key (co-located
  * scan, NO exchange before the join). Prints exchange counts from the
  * physical plan and wall times for both variants — the measured form of
  * "pre-partition the big join instead of shuffling it every query".
  *
  * Broadcast is disabled so the exchange difference is visible at local
  * test scale (at real scale neither side broadcasts anyway).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.BucketStress [sfDir]
  */
object BucketStress {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warehouse = "/tmp/graft-warehouse"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bucket-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")

    // bucketed + sorted copies on the join key (16 buckets ~ executor
    // parallelism at this scale; at cluster scale pick buckets ≈ a small
    // multiple of total cores). DROP TABLE alone is not enough: the
    // in-memory catalog forgets tables between runs but the managed
    // LOCATION persists, and saveAsTable refuses to reuse it.
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(s"$warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    li.write.mode("overwrite").bucketBy(16, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    def shape(df: org.apache.spark.sql.DataFrame): (Int, String) = {
      val plan = df.queryExecution.executedPlan.toString
      ("Exchange".r.findAllIn(plan).length,
        if (plan.contains("SortMergeJoin")) "SMJ" else "other")
    }
    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      // execute a FRESH plan each iteration via toRdd: Dataset.count()
      // would rewrite the plan and prune the aggregates away, and
      // re-executing the SAME QueryExecution reuses its materialized
      // shuffle stages (near-zero repeat times, measured)
      val qe = mk().queryExecution
      val t0 = System.nanoTime(); qe.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def q(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"l_extendedprice").as("rev"), count(lit(1)).as("n"))

    def plainQ() = q(li, ord)
    def bucketQ() = q(spark.table("li_bucketed"), spark.table("ord_bucketed"))
    val (pe, pj) = shape(plainQ())
    val (be, bj) = shape(bucketQ())
    val pt = Seq(time(plainQ _), time(plainQ _), time(plainQ _)).min
    val bt = Seq(time(bucketQ _), time(bucketQ _), time(bucketQ _)).min
    println(f"BUCKET plain: join=$pj exchanges=$pe time=$pt%.2fs")
    println(f"BUCKET bucketed: join=$bj exchanges=$be time=$bt%.2fs")
    assert(be < pe, s"bucketed plan must drop the pre-join exchanges ($be vs $pe)")
    spark.stop()
  }
}
