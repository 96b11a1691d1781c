package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.modules.WellOps

class WellOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")

  test("wellConnStatus: 0->+ opens (incl. first positive), +->0 shuts") {
    val cpi = Seq(
      (ts("2000-01-01"), "CPI:OP1:1,1,1", 0.0),
      (ts("2000-02-01"), "CPI:OP1:1,1,1", 5.0),  // OPEN
      (ts("2000-03-01"), "CPI:OP1:1,1,1", 6.0),  // no change
      (ts("2000-04-01"), "CPI:OP1:1,1,1", 0.0),  // SHUT
      (ts("2000-01-01"), "CPI:OP2:2,2,2", 3.0),  // first positive → OPEN
      (ts("2000-01-01"), "FOPT", 1000.0),         // not a CPI vector
      (ts("2000-01-01"), "CPI:OP1:123", 7.0)      // malformed ijk → ignored
    ).toDF("DATE", "VECTOR", "VALUE")
    val out = WellOps.wellConnStatus(cpi).orderBy("WELL", "DATE").collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getAs[String]("WELL"), r.getAs[String]("OP/SH"))).toSeq ==
      Seq(("OP1", "OPEN"), ("OP1", "SHUT"), ("OP2", "OPEN")))
  }

  test("aggregateLayerToZone: KH sums over open layers; any-open wins") {
    val compdat = Seq(
      ("OP1", "Upper", ts("2000-01-01"), "OPEN", 10.0),
      ("OP1", "Upper", ts("2000-01-01"), "SHUT", 99.0),
      ("OP1", "Lower", ts("2000-01-01"), "SHUT", 5.0)
    ).toDF("WELL", "ZONE", "DATE", "OP/SH", "KH")
    val out = WellOps.aggregateLayerToZone(compdat).orderBy("ZONE").collect()
    assert(out(0).getAs[String]("ZONE") == "Lower" && out(0).getAs[Double]("KH") == 0.0
      && out(0).getAs[String]("OP/SH") == "SHUT")
    assert(out(1).getAs[String]("ZONE") == "Upper" && out(1).getAs[Double]("KH") == 10.0
      && out(1).getAs[String]("OP/SH") == "OPEN")
  }

  test("mergeCompdatAndConnstatus: status wins for covered wells, others kept") {
    val compdat = Seq(
      ("OP1", 1, 1, 1, ts("2000-01-01"), "OPEN", 10.0),
      ("OP2", 2, 2, 2, ts("2000-01-01"), "OPEN", 20.0)
    ).toDF("WELL", "I", "J", "K1", "DATE", "OP/SH", "KH")
    val cs = Seq(("OP1", 1, 1, 1, ts("2000-02-01"), "SHUT"))
      .toDF("WELL", "I", "J", "K", "DATE", "OP/SH")
    val out = WellOps.mergeCompdatAndConnstatus(compdat, cs)
    val op1 = out.filter("WELL = 'OP1'").collect()
    assert(op1.length == 1 && op1.head.getAs[String]("OP/SH") == "SHUT")
    assert(op1.head.getAs[Timestamp]("DATE") == ts("2000-02-01"))
    val op2 = out.filter("WELL = 'OP2'").collect()
    assert(op2.length == 1 && op2.head.getAs[String]("OP/SH") == "OPEN")
  }
}
