package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.modules.{Pillars, WellCompletionData}

class PillarsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pillars: stats + OWC/GOC contacts per pillar (reference contact rules)") {
    // one pillar: gas cap (with epsilon oil) / oil zone / water zone
    val grid = Seq(
      (1, 1, 2000.0, 10.0, 4.0, 0.05, 0.90), // shallow: gas, SOIL=0.05
      (1, 1, 2010.0, 10.0, 3.0, 0.20, 0.10), // oil zone, SOIL=0.70
      (1, 1, 2020.0, 10.0, 2.0, 0.90, 0.00), // deep: water, SOIL=0.10
      (2, 1, 2000.0, 12.0, 6.0, 0.10, 0.00)  // oily but NO water on pillar
    ).toDF("I", "J", "Z", "VOLUME", "PORV", "SWAT", "SGAS")
    val out = Pillars.df(grid)
    val p = out.filter("PILLAR = '1-1'").collect().head
    assert(p.getAs[Long]("N_CELLS") == 3)
    assert(p.getAs[Double]("VOLUME") == 30.0)
    // pillar porosity is porevolume-weighted: PORV/VOLUME = 9/30
    assert(math.abs(p.getAs[Double]("PORO") - 0.3) < 1e-12)
    // OWC: deepest cell with SOIL > 0.2 (the oil zone), NOT the water cell
    assert(p.getAs[Double]("OWC") == 2010.0)
    // GOC: deepest SGAS > 0.7 cell that still has SOIL > 0.01
    assert(p.getAs[Double]("GOC") == 2000.0)
    val q = out.filter("PILLAR = '2-1'").collect().head
    assert(q.isNullAt(q.fieldIndex("OWC"))) // no water in pillar → ineligible
    assert(q.isNullAt(q.fieldIndex("GOC")))

    // gas injected into the water leg (no oil) must NOT read as a GOC —
    // and with BOTH contact frames empty the reference adds no contact
    // columns at all (pillars.py:136-137 skips the merge)
    val injected = Seq(
      (1, 1, 2000.0, 10.0, 0.10, 0.90), // SOIL = 0.0: injected gas
      (1, 1, 2010.0, 10.0, 0.95, 0.00)
    ).toDF("I", "J", "Z", "VOLUME", "SWAT", "SGAS")
    val inj = Pillars.df(injected)
    assert(!inj.columns.contains("GOC") && !inj.columns.contains("OWC"))

    // one-sided contacts survive: OWC present, GOC frame empty → OWC
    // alone left-joins (pillars.py:314-315), GOC column absent
    val owcOnly = Pillars.df(Seq(
      (1, 1, 2000.0, 10.0, 0.30, 0.00), // oil zone, SOIL=0.70
      (1, 1, 2010.0, 10.0, 0.90, 0.00)  // water below
    ).toDF("I", "J", "Z", "VOLUME", "SWAT", "SGAS"))
    assert(owcOnly.collect().head.getAs[Double]("OWC") == 2000.0)
    assert(!owcOnly.columns.contains("GOC"))

    // two-phase gas-water: GWC named column, water-pillar eligibility
    val gw = Pillars.df(Seq(
      (1, 1, 2000.0, 10.0, 0.10, 0.90),
      (1, 1, 2010.0, 10.0, 0.95, 0.00)
    ).toDF("I", "J", "Z", "VOLUME", "SWAT", "SGAS"), gasWater = true)
    val g = gw.collect().head
    assert(g.getAs[Double]("GWC") == 2000.0)
    assert(!gw.columns.contains("GOC") && !gw.columns.contains("OWC"))
  }

  test("pillars --group: sum volumes, mean coords/contacts, region-keyed") {
    val stats = Seq(
      ("1-1", 1, 2L, 100.0, 20.0, 10.0, 1500.0),
      ("1-2", 1, 2L, 300.0, 60.0, 30.0, 1700.0),
      ("2-1", 2, 4L, 400.0, 80.0, 50.0, 1900.0)
    ).toDF("PILLAR", "EQLNUM", "N_CELLS", "VOLUME", "PORV", "X", "OWC")
    // global: one row, sums 6/800/160, means 30/1700
    val g = Pillars.grouped(stats).collect().head
    assert(g.getAs[Long]("N_CELLS") == 8L && g.getAs[Double]("VOLUME") == 800.0)
    assert(g.getAs[Double]("X") == 30.0 && g.getAs[Double]("OWC") == 1700.0)
    // region-keyed: one row per EQLNUM
    val byReg = Pillars.grouped(stats, region = Some("EQLNUM"))
      .collect().map(r => r.getAs[Int]("EQLNUM") ->
        (r.getAs[Double]("VOLUME"), r.getAs[Double]("OWC"))).toMap
    assert(byReg(1) == ((400.0, 1600.0)) && byReg(2) == ((400.0, 1900.0)))
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
