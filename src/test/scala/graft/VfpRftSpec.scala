package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.modules.{Rft, Vfp}

class VfpRftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("VFPPROD: N-d axes flatten to long rows with positional axis lookup") {
    val df = Vfp.df(spark,
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
        |""".stripMargin)
    assert(df.count() == 12) // 4 table records x 3 flow values
    val r = df.filter("PRESSURE = 100.0 AND WFR = 0.5 AND RATE = 500.0").collect().head
    assert(r.getAs[Double]("TAB") == 232.0)
    assert(r.getAs[Double]("GFR") == 900.0)
    assert(r.getAs[Int]("TABLE_NUMBER") == 1)
    // axis ordering: rows sorted by axes then rate
    val first = df.collect().head
    assert(first.getAs[Double]("PRESSURE") == 50.0 && first.getAs[Double]("RATE") == 100.0)
  }

  test("VFP column contract, unit system lookups and tablenumbers filter") {
    // the GAS/WGR/GOR METRIC case from the reference's VFPPROD_CASES
    // (tests/test_vfp.py:30-120) plus a UNITS-less FIELD-free table
    val deck =
      """VFPPROD
        | 1 3000.0 GAS WGR GOR THP '' METRIC BHP /
        | 50000 500000 5e+06 /
        | 40 100 /
        | 0 1e-05 /
        | 500 4000 /
        | 0 /
        | 1 1 1 1 160.11 130.21 180.31 /
        | 2 1 1 1 240.15 210.25 260.35 /
        |/
        |VFPPROD
        | 2 3000.0 GAS WCT GOR THP '' /
        | 50000 /
        | 40 /
        | 0 /
        | 500 /
        | 0 /
        | 1 1 1 1 160.11 /
        |/
        |""".stripMargin
    val df = Vfp.df(spark, deck, units = true)
    // reference column order (test_vfp.py expected frames), units appended
    assert(df.columns.toSeq == Seq("RATE", "PRESSURE", "WFR", "GFR", "ALQ", "TAB",
      "VFP_TYPE", "TABLE_NUMBER", "DATUM", "RATE_TYPE", "WFR_TYPE", "GFR_TYPE",
      "ALQ_TYPE", "PRESSURE_TYPE", "TAB_TYPE", "UNIT_TYPE",
      "RATE_UNIT", "PRESSURE_UNIT", "WFR_UNIT", "GFR_UNIT", "ALQ_UNIT"))
    val t1 = df.filter("TABLE_NUMBER = 1").collect()
    assert(t1.head.getAs[String]("ALQ_TYPE") == "''")
    assert(t1.head.getAs[String]("UNIT_TYPE") == "METRIC")
    assert(t1.head.getAs[String]("RATE_UNIT") == "sm3/day")
    assert(t1.head.getAs[String]("PRESSURE_UNIT") == "barsa")
    assert(t1.head.getAs[String]("WFR_UNIT") == "sm3/sm3")
    assert(t1.head.getAs[String]("GFR_UNIT") == "sm3/sm3")
    assert(t1.head.getAs[String]("ALQ_UNIT") == "")
    // no UNITS entry → the DEFAULT system (reference UNITTYPE.DEFAULT)
    val t2 = df.filter("TABLE_NUMBER = 2").collect()
    assert(t2.head.getAs[String]("UNIT_TYPE") == "DEFAULT")
    assert(t2.head.getAs[String]("RATE_UNIT") == "")
    // tablenumbers filter prunes whole tables (vfp/_vfp.py:436-437)
    assert(Vfp.df(spark, deck, tablenumbers = Seq(2))
      .select("TABLE_NUMBER").distinct().collect().map(_.getInt(0)).toSeq == Seq(2))
    // DEFAULT unit system round-trips as 1*, never as a 'DEFAULT' token
    // (the reference writes 1* for UNITTYPE.DEFAULT)
    val text = graft.write.IncludeWriter.vfpprod(Vfp.df(spark, deck))
    assert(!text.contains("'DEFAULT'"))
    val back = Vfp.df(spark, text)
    assert(back.filter("TABLE_NUMBER = 2").collect().head
      .getAs[String]("UNIT_TYPE") == "DEFAULT")
    assert(back.filter("TABLE_NUMBER = 1").collect().head
      .getAs[String]("UNIT_TYPE") == "METRIC")
  }

  test("VFPINJ: THP-only table flattens") {
    val df = Vfp.df(spark,
      """VFPINJ
        | 2 2500.0 'WAT' 'THP' 'METRIC' 'BHP' /
        | 10 20 /
        | 5 /
        | 1 301 302 /
        |/
        |""".stripMargin)
    assert(df.count() == 2)
    assert(df.filter("RATE = 20.0").collect().head.getAs[Double]("TAB") == 302.0)
  }

  test("RFT segment topology: one row per inflow, LEAF/JUNCTION flags") {
    // reference test_minimal_branched_well: 2 -> 1, 3 -> 1 (1 junction)
    val seg = Seq(
      (1, null.asInstanceOf[Integer], 100.0),
      (2, Integer.valueOf(1), 90.0),
      (3, Integer.valueOf(1), 80.0)
    ).toDF("SEGIDX", "SEGNXT", "SEGPRES")
    val topo = Rft.processSegTopology(seg).collect()
    assert(topo.length == 4) // junction row duplicated per upstream
    assert(topo.count(_.getAs[Boolean]("LEAF")) == 2)
    val junctionUps = topo.filter(_.getAs[Int]("SEGIDX") == 1)
      .map(_.getAs[Int]("SEGIDX_upstream")).toSet
    assert(junctionUps == Set(2, 3))
    val byIdx = topo.groupBy(_.getAs[Int]("SEGIDX"))
    assert(byIdx(1).forall(_.getAs[Boolean]("JUNCTION")))
    assert(byIdx(1).forall(_.getAs[Boolean]("LONELYSEG")))
    assert(byIdx(2).forall(r => r.getAs[Boolean]("LEAF") && r.isNullAt(r.fieldIndex("SEGPRES_upstream"))))
    // single-segment well: LEAF and LONELYSEG, one row (reference test_minimal_well)
    val one = Rft.processSegTopology(
      Seq((1, null.asInstanceOf[Integer], 195.8)).toDF("SEGIDX", "SEGNXT", "SEGPRES"))
      .collect()
    assert(one.length == 1 && one.head.getAs[Boolean]("LEAF"))
    intercept[IllegalArgumentException](
      Rft.processSegTopology(Seq((1, 1.0)).toDF("SEGNXT", "SEGPRES")))
  }

  test("RFT ICD split: lonely leaf branches are ICDs (test_single_branch_icd)") {
    // | segidx 1; |-* 2/4; |-* 3/5 — ICDs 4 and 5 on their own branches
    val wellseg = Seq(
      (1, null.asInstanceOf[Integer], 1),
      (2, Integer.valueOf(1), 1),
      (3, Integer.valueOf(2), 1),
      (4, Integer.valueOf(2), 2),
      (5, Integer.valueOf(3), 3)
    ).toDF("SEGIDX", "SEGNXT", "SEGBRNO")
    val (segData, icdData) = Rft.splitSegIcd(wellseg)
    assert(icdData.count() == 2)
    assert(icdData.collect().map(_.getAs[Int]("SEGIDX")).sorted.toSeq == Seq(4, 5))
    assert(icdData.collect().map(_.getAs[Int]("SEGBRNO")).sorted.toSeq == Seq(2, 3))
    assert(Rft.countWellBranches(segData) == 1)
    // tubing segments on branch 1 are not lonely (branch has several rows)
    assert(segData.filter("SEGIDX <= 3").collect().forall(!_.getAs[Boolean]("LONELYSEG")))

    // two-branch well WITHOUT ICDs: split returns everything + empty ICD
    val twoBranch = Seq(
      (1, null.asInstanceOf[Integer], 1),
      (2, Integer.valueOf(1), 1),
      (3, Integer.valueOf(2), 1),
      (4, Integer.valueOf(2), 2),
      (5, Integer.valueOf(4), 2)
    ).toDF("SEGIDX", "SEGNXT", "SEGBRNO")
    val (all2, icd2) = Rft.splitSegIcd(twoBranch)
    assert(icd2.isEmpty && all2.count() >= 5)

    // empty segment frame: both halves empty, no NPE
    val (e1, e2) = Rft.splitSegIcd(wellseg.limit(0))
    assert(e1.isEmpty && e2.isEmpty)
  }

  test("RFT connection-ICD-segment chain with anti-join remainder") {
    val con = Seq((1, 10, 250.0), (2, 20, 260.0)).toDF("CONIDX", "CONSEGNO", "CONPRES")
    val icd = Seq((10, 2)).toDF("SEGIDX", "SEGNXT") // ICD at seg 10 drains to seg 2
    val seg = Seq((2, 240.0), (20, 255.0)).toDF("SEGIDX", "SEGPRES")
    val merged = Rft.mergeIcdSegConseg(con, icd, seg)
    assert(merged.count() == 2)
    val viaIcd = merged.filter("CONIDX = 1").collect().head
    assert(viaIcd.getAs[Double]("SEGPRES") == 240.0) // through the ICD's SEGNXT
    val direct = merged.filter("CONIDX = 2").collect().head
    assert(direct.getAs[Double]("SEGPRES") == 255.0) // direct segment join
    val derived = Rft.addDerived(merged.withColumnRenamed("CONPRES", "CONPRES"))
    assert(derived.columns.contains("COMPLETION_DP"))
  }

  test("rft addDerived: drawdown, alias, lengths and IEEE scaled rates (add_extras)") {
    val df = Seq(
      //  CONPRES, SEGPRES, PRESSURE, CONLENST, CONLENEN, CONORAT
      (260.0, 240.0, 300.0, 1500.0, 1510.0, 50.0), // normal
      (0.0, 240.0, 300.0, 1500.0, 1500.0, 50.0),   // zero conpres + point interval
      (260.0, 240.0, 300.0, 1500.0, 1500.0, 0.0))  // 0-rate over 0-length
      .toDF("CONPRES", "SEGPRES", "PRESSURE", "CONLENST", "CONLENEN", "CONORAT")
    val d = Rft.addDerived(df).collect()
    // DRAWDOWN = PRESSURE - CONPRES where CONPRES > 0, else 0.0
    assert(d(0).getAs[Double]("DRAWDOWN") == 40.0)
    assert(d(1).getAs[Double]("DRAWDOWN") == 0.0)
    // COMPLETION_DP zero-guard
    assert(d(0).getAs[Double]("COMPLETION_DP") == 20.0)
    assert(d(1).getAs[Double]("COMPLETION_DP") == 0.0)
    // CONBPRES is a PRESSURE alias; CONMD/CONLENTH from the interval
    assert(d(0).getAs[Double]("CONBPRES") == 300.0)
    assert(d(0).getAs[Double]("CONMD") == 1505.0)
    assert(d(0).getAs[Double]("CONLENTH") == 10.0)
    // scaled rates follow IEEE like the pandas reference: x/0 = inf, 0/0 = NaN
    assert(d(0).getAs[Double]("CONORATS") == 5.0)
    assert(d(1).getAs[Double]("CONORATS").isPosInfinity)
    assert(d(2).getAs[Double]("CONORATS").isNaN)
  }
}
