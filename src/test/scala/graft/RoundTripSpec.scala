package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.DeckParser
import graft.modules.{Summary, Vfp}
import graft.write.IncludeWriter

class RoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vfpDeck =
    """VFPPROD
      | 1 3000.0 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'METRIC' 'BHP' /
      | 100 500 1000 /
      | 50 100 /
      | 0.0 0.5 /
      | 900 /
      | 0 /
      | 1 1 1 1 201 202 203 /
      | 2 1 1 1 211 212 213 /
      | 1 2 1 1 221 222 223 /
      | 2 2 1 1 231 232 233 /
      |/
      |""".stripMargin

  test("VFPPROD round-trip: long form -> include text -> parse -> same long form") {
    val long1 = Vfp.df(spark, vfpDeck)
    val text = IncludeWriter.vfpprod(long1)
    val long2 = Vfp.df(spark, text)
    val key = (r: org.apache.spark.sql.Row) => (
      r.getAs[Int]("TABLE_NUMBER"), r.getAs[Double]("THP"), r.getAs[Double]("WFR"),
      r.getAs[Double]("GFR"), r.getAs[Double]("ALQ"), r.getAs[Double]("RATE"),
      r.getAs[Double]("TAB"))
    assert(long1.collect().map(key).toSet == long2.collect().map(key).toSet)
    assert(long2.count() == 12)
  }

  test("duplicate timestamps get TIMESTEP offsets (W5)") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      ("FOPT", ts("2000-01-01 00:00:00"), 1.0, 1),
      ("FOPT", ts("2000-01-01 00:00:00"), 2.0, 2),
      ("FOPT", ts("2000-02-01 00:00:00"), 3.0, 3)
    ).toDF("VECTOR", "DATE", "VALUE", "ord")
    val out = Summary.ensureUniqueDates(df, Seq("VECTOR"),
        Seq(org.apache.spark.sql.functions.col("ord")), stepSeconds = 1.0)
      .orderBy("DATE").collect()
    assert(out.map(_.getTimestamp(1).toString).toSeq == Seq(
      "2000-01-01 00:00:00.0", "2000-01-01 00:00:01.0", "2000-02-01 00:00:00.0"))
  }
}
