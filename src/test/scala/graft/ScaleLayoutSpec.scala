package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Ops

/** Physical-layout tools for the 100 TB contract: salted joins for skew,
  * bucketed tables for exchange-free co-located joins.
  */
class ScaleLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(99L)).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (99L, "hot"), (5L, "c")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("k", "payload", "v")
    val salted = Ops.saltedJoin(big, small, Seq("k"), salts = 8).select("k", "payload", "v")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join refuses result-distorting outer types") {
    val big = spark.range(10).select(col("id").as("k"))
    val small = Seq((1L, "a")).toDF("k", "v")
    // right/full outer would replicate unmatched small-side rows once per salt
    for (bad <- Seq("right_outer", "full_outer", "outer", "full"))
      assertThrows[IllegalArgumentException](
        Ops.saltedJoin(big, small, Seq("k"), salts = 4, joinType = bad))
    // the preserved types still work
    assert(Ops.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "left_anti")
      .count() == 9)
    assert(Ops.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "left_outer")
      .count() == 10)
  }

  test("date-partitioned writes prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val firstDay = spark.read.parquet(dir).agg(min("day")).head.getDate(0)
    val q = spark.read.parquet(dir).filter(col("day") === lit(firstDay))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("day#"),
      s"expected partition pruning in:\n$plan")
    // pruned scan must read strictly fewer files than the table holds
    val allDays = spark.read.parquet(dir).select("day").distinct().count()
    assert(allDays > 1 && q.count() > 0)
  }

  test("bucketed tables join with no shuffle exchange") {
    // default warehouse (./spark-warehouse); DROP TABLE below removes the
    // managed-table files
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    a.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
