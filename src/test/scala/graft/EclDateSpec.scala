package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.EclDate

class EclDateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parses Eclipse date literals via native codegen expression") {
    val df = Seq("1 'JAN' 2000", "01 JLY 1999", "15 DEC 2262", "garbage", "")
      .toDF("s")
      .withColumn("d", EclDate.ecl_date(col("s")))
    val out = df.collect().map(r =>
      if (r.isNullAt(1)) null else r.getDate(1).toString)
    assert(out(0) == "2000-01-01")
    assert(out(1) == "1999-07-01") // JLY alias
    assert(out(2) == "2262-12-15") // beyond pandas' year-2262 ns limit
    assert(out(3) == null && out(4) == null)
  }

  test("registered SQL function and codegen plan") {
    EclDate.register(spark)
    val out = spark.sql("SELECT ecl_date('3 MAR 2024') AS d").collect().head
    assert(out.getDate(0).toString == "2024-03-03")
    // the expression must live inside a WholeStageCodegen span (a local
    // literal would be constant-folded, so drive it from a parquet scan)
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("s", concat(lit("1 'JAN' "), (lit(2000) + col("doc_id") % 100).cast("string")))
      .withColumn("d", EclDate.ecl_date(col("s")))
    // `*(n)` marks a WholeStageCodegen stage; ecldateparse must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("ecldateparse")))
    assert(df.filter("d = date'2000-01-01'").count() > 0)
  }
}
