package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.modules.FipReports

class FipReportsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // synthetic PRT fragment modeled on the reference's report-block format
  private val prt =
    """  REPORT  53     1 JAN 2021   *  RUN
      |                                                =================================
      |                                                : FIPNUM  REPORT REGION    1    :
      |                                                =================================
      | :CURRENTLY IN PLACE       :      9891201.                     9891201.:       4179920. :            5.     74323390.      74323396.
      | :OUTFLOW TO OTHER REGIONS :        35270.                       35270.:        114929. :            0.       897217.        897217.
      | :OUTFLOW THROUGH WELLS    :                                         0.:             0. :                                         0.
      | :ORIGINALLY IN PLACE      :     19902728.                    19902728.:       4262141. :            0.     74631061.      74631061.
      | :OUTFLOW TO REGION   2    :      -221115.                     -221115.:         45581. :           -0.     -4660403.      -4660403.
      |  REPORT  54     2 JAN 2021   *  RUN
      |                                                : FIPNUM  REPORT REGION    2    :
      | :CURRENTLY IN PLACE       :     24704298.                    24704298.:       4222285. :           -0.    562865855.     562865855.
      |""".stripMargin

  test("stateful PRT scrape: date+region carried by forward-fill, rows parsed") {
    val linesDf = spark.createDataset(prt.linesIterator.toSeq).rdd
      .zipWithIndex.map { case (l, i) => (l, i, "test.PRT") }.toDF("line", "idx", "src")
    val df = FipReports.fromLines(linesDf)
    assert(df.count() == 6)
    val cur1 = df.filter("REGION = 1 AND DATATYPE = 'CURRENTLY IN PLACE'").collect().head
    assert(cur1.getAs[java.sql.Date]("DATE").toString == "2021-01-01")
    assert(cur1.getAs[Double]("STOIIP_OIL") == 9891201.0)
    assert(cur1.getAs[Double]("STOIIP_TOTAL") == 9891201.0)
    assert(cur1.getAs[Double]("WIIP_TOTAL") == 4179920.0)
    assert(cur1.getAs[Double]("GIIP_TOTAL") == 7.4323396e7)
    val outflow = df.filter("DATATYPE = 'OUTFLOW TO REGION'").collect().head
    assert(outflow.getAs[Int]("TO_REGION") == 2)
    assert(outflow.getAs[Double]("STOIIP_OIL") == -221115.0)
    val cur2 = df.filter("REGION = 2").collect().head
    assert(cur2.getAs[java.sql.Date]("DATE").toString == "2021-01-02")
  }

  test("two-phase gas-water report: blank oil section parses as nulls") {
    // reference test_fipreports.py::test_gaswater_report
    val gw =
      """                                              =================================
        |                                                : FIPNUM  REPORT REGION    2    :
        |                                                :     PAV =       4045.00  BARSA:
        | :-------------------------:-------------------------------------------:----------------:-------------------------------------------:
        | :CURRENTLY IN PLACE       :                                           :      19135648. :      8457278.                     8457278.:
        | :OUTFLOW TO OTHER REGIONS :                                           :             0. :            0.                           0.:
        | :OUTFLOW THROUGH WELLS    :                                           :             0. :                                         0.:
        | :ORIGINALLY IN PLACE      :                                           :      19135648. :      8457278.                     8457278.:
        |""".stripMargin
    val linesDf = spark.createDataset(gw.linesIterator.toSeq).rdd
      .zipWithIndex.map { case (l, i) => (l, i, "test.PRT") }.toDF("line", "idx", "src")
    val df = FipReports.fromLines(linesDf)
    val rows = df.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Int]("REGION") == 2))
    val cur = rows.find(_.getAs[String]("DATATYPE") == "CURRENTLY IN PLACE").get
    assert(cur.isNullAt(cur.fieldIndex("STOIIP_OIL")))
    assert(cur.isNullAt(cur.fieldIndex("STOIIP_TOTAL")))
    assert(cur.getAs[Double]("WIIP_TOTAL") == 19135648.0)
    assert(cur.getAs[Double]("GIIP_GAS") == 8457278.0)
    assert(cur.getAs[Double]("GIIP_TOTAL") == 8457278.0)
  }

  test("scrapes the reference-shaped real PRT when available") {
    val p = "/root/reference/tests/data/fipreports/TEST1.PRT"
    if (new java.io.File(p).exists()) {
      val df = FipReports.df(spark, p)
      assert(df.count() >= 5) // one FIPNUM block in this file (~7 data rows)
      assert(df.filter("DATATYPE = 'CURRENTLY IN PLACE'").count() > 0)
      // FIPNUM blocks exist only for region 2 in this file
      assert(df.select("REGION").distinct().collect().map(_.getInt(0)).toSet == Set(2))
      // other FIP families select their own region blocks
      val zon = FipReports.df(spark, p, "FIPZON")
      assert(zon.select("REGION").distinct().count() == 2)
    }
  }
}
