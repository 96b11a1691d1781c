package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.modules.{Pillars, WellCompletionData}

class PillarsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pillars: stats + OWC/GOC contacts per pillar") {
    // one pillar, water below (high SWAT deep), gas on top (high SGAS shallow)
    val grid = Seq(
      (1, 1, 2000.0, 10.0, 0.1, 0.9), // shallow: gas
      (1, 1, 2010.0, 10.0, 0.2, 0.1),
      (1, 1, 2020.0, 10.0, 0.9, 0.0), // deep: water
      (2, 1, 2000.0, 12.0, 0.1, 0.0)
    ).toDF("I", "J", "Z", "VOLUME", "SWAT", "SGAS")
    val out = Pillars.df(grid)
    val p = out.filter("PILLAR = '1-1'").collect().head
    assert(p.getAs[Long]("N_CELLS") == 3)
    assert(p.getAs[Double]("VOLUME") == 30.0)
    assert(p.getAs[Double]("OWC") == 2020.0) // deepest high-SWAT cell
    assert(p.getAs[Double]("GOC") == 2000.0) // shallowest high-SGAS cell
    val q = out.filter("PILLAR = '2-1'").collect().head
    assert(q.isNullAt(q.fieldIndex("OWC"))) // no water contact on that pillar
  }

  test("phase volumes: SOIL residual, per-phase PORV split, surface variants") {
    // reference test_pillars.py::test_compute_volumes
    val threePhase = Seq((1.0, 0.5, 0.2, 0.8, 2.0))
      .toDF("PORV", "SWAT", "SGAS", "1OVERBO", "1OVERBG")
    val r = Pillars.computeVolumes(threePhase).collect().head
    assert(math.abs(r.getAs[Double]("SOIL") - 0.3) < 1e-12)
    assert(r.getAs[Double]("WATVOL") == 0.5)
    assert(r.getAs[Double]("GASVOL") == 0.2)
    assert(math.abs(r.getAs[Double]("OILVOLSURF") - 0.24) < 1e-12)
    assert(r.getAs[Double]("GASVOLSURF") == 0.4)
    // two-phase oil-water: no GASVOL column
    val twoPhase = Pillars.computeVolumes(Seq((1.0, 0.9)).toDF("PORV", "SWAT"))
    assert(!twoPhase.columns.contains("GASVOL"))
    assert(math.abs(twoPhase.collect().head.getAs[Double]("SOIL") - 0.1) < 1e-12)
  }

  test("wellcompletiondata: zone rollup with status override and exclusion") {
    val ts = Timestamp.valueOf("2000-01-01 00:00:00")
    val compdat = Seq(
      ("OP1", 1, 1, 1, 1, "OPEN", 10.0, ts),
      ("OP1", 1, 1, 2, 2, "OPEN", 20.0, ts),
      ("R_A1", 2, 2, 1, 1, "OPEN", 5.0, ts) // excluded by prefix
    ).toDF("WELL", "I", "J", "K1", "K2", "OP/SH", "KH", "DATE")
    val out = WellCompletionData.df(compdat,
      zonemap = Map(1 -> "Upper", 2 -> "Lower"),
      excludeWellPrefix = Some("R_"))
    assert(out.filter("WELL = 'R_A1'").count() == 0)
    val rows = out.filter("WELL = 'OP1'").collect()
      .map(r => r.getAs[String]("ZONE") -> (r.getAs[Double]("KH"), r.getAs[String]("OP/SH"))).toMap
    assert(rows("Upper") == ((10.0, "OPEN")))
    assert(rows("Lower") == ((20.0, "OPEN")))
    // reference test_empty_zonemap: empty / nothing-matching maps → empty
    assert(WellCompletionData.df(compdat, zonemap = Map.empty).count() == 0)
    assert(WellCompletionData.df(compdat,
      zonemap = Map(1000 -> "ZONE1", -1 -> "ZONE1")).count() == 0)
    // partial zonemap: uncovered layers silently drop
    val partial = WellCompletionData.df(compdat, zonemap = Map(1 -> "Upper"),
      excludeWellPrefix = Some("R_"))
    assert(partial.count() == 1 && partial.head.getAs[String]("ZONE") == "Upper")
  }
}
