package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.modules.{Equil, Faults, Gruptree, Pvt, Satfunc, Wcon}

class ModulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("satfunc: SWOF reshapes per-SATNUM flat DATA into rows") {
    val df = Satfunc.df(spark,
      """SWOF
        | 0.1 0.0 1.0 0.0
        | 0.5 0.3 0.5 0.0
        | 1.0 1.0 0.0 0.0 /
        | 0.2 0.0 1.0 0.0
        | 1.0 1.0 0.0 0.0 /
        |/
        |""".stripMargin)
    assert(df.count() == 5)
    assert(df.filter("SATNUM = 1").count() == 3)
    assert(df.filter("SATNUM = 2").count() == 2)
    val sw = df.filter("SATNUM = 2").orderBy("SW").select("SW").collect().map(_.getDouble(0))
    assert(sw.toSeq == Seq(0.2, 1.0))
  }

  test("corpus mode: wcon/gruptree/msw multi-deck frames == per-deck runs") {
    import graft.io.DeckParser
    import graft.modules.Msw
    def deck(d: Int) =
      s"""DATES
         | 1 'JAN' ${2000 + d} /
         |/
         |WELSPECS
         | 'OP$d' 'GRP$d' 1 1 /
         |/
         |GRUPTREE
         | 'GRP$d' 'FIELD' /
         |/
         |GRUPNET
         | 'GRP$d' ${10.0 + d} /
         |/
         |WCONPROD
         | 'OP$d' 'OPEN' 'ORAT' ${100 + d} /
         |/
         |WELSEGS
         | 'OP$d' ${2500 + d} 0 1* 'ABS' /
         | 2 2 1 1 ${2520 + d} ${2510 + d} 0.15 0.0001 /
         |/
         |WSEGVALV
         | 'OP$d' 2 0.5 ${0.001 * (d + 1)} /
         |/
         |""".stripMargin
    val evA = DeckParser.toDS(spark, deck(1), deckId = "A").toDF()
    val evB = DeckParser.toDS(spark, deck(2), deckId = "B").toDF()
    val corpus = evA.unionByName(evB)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    // wcon
    val wc = Wcon.fromEvents(corpus, keepDeckId = true)
    assert(rows(wc.filter("deckId = 'A'").drop("deckId")) == rows(Wcon.fromEvents(evA)))
    assert(rows(wc.filter("deckId = 'B'").drop("deckId")) == rows(Wcon.fromEvents(evB)))
    // gruptree: deck B's GRP2/date-2002 tree must not leak into deck A's
    val gt = Gruptree.fromEvents(corpus, keepDeckId = true)
    assert(rows(gt.filter("deckId = 'A'").drop("deckId")) ==
      rows(Gruptree.fromEvents(evA)))
    assert(rows(gt.filter("deckId = 'B'").drop("deckId")) ==
      rows(Gruptree.fromEvents(evB)))
    // msw: per-deck headers fan onto per-deck segments only
    val ws = Msw.welsegs(corpus, keepDeckId = true)
    assert(rows(ws.filter("deckId = 'A'").drop("deckId")) == rows(Msw.welsegs(evA)))
    assert(rows(ws.filter("deckId = 'B'").drop("deckId")) == rows(Msw.welsegs(evB)))
    val wv = Msw.wsegvalv(corpus, keepDeckId = true)
    assert(rows(wv.filter("deckId = 'A'").drop("deckId")) == rows(Msw.wsegvalv(evA)))
    // default single-deck entry still refuses a corpus frame
    intercept[IllegalArgumentException](Wcon.fromEvents(corpus))
    intercept[IllegalArgumentException](Gruptree.fromEvents(corpus))
    intercept[IllegalArgumentException](Msw.welsegs(corpus))
  }

  test("satfunc: explicit ntsfun splits an ambiguous single-record keyword") {
    // two tables concatenated in ONE record (no interior '/'): the record
    // counter alone sees one SATNUM — the reference needs TABDIMS/ntsfun
    // here (inferdims.py); ntsfun=2 splits at the saturation decrease
    val deck =
      """SWOF
        | 0.1 0.0 1.0 0.0
        | 0.5 0.3 0.5 0.0
        | 1.0 1.0 0.0 0.0
        | 0.2 0.0 1.0 0.0
        | 1.0 1.0 0.0 0.0 /
        |/
        |""".stripMargin
    val ambiguous = Satfunc.df(spark, deck)
    assert(ambiguous.filter("SATNUM = 1").count() == 5) // under-counted
    val split = Satfunc.df(spark, deck, ntsfun = Some(2))
    assert(split.filter("SATNUM = 1").count() == 3)
    assert(split.filter("SATNUM = 2").count() == 2)
    val sw2 = split.filter("SATNUM = 2").orderBy("SW")
      .select("SW").collect().map(_.getDouble(0))
    assert(sw2.toSeq == Seq(0.2, 1.0))
    // a wrong override fails loudly instead of mis-numbering silently
    val e = intercept[IllegalArgumentException](Satfunc.df(spark, deck, Some(3)).count())
    assert(e.getMessage.contains("yield 2 tables"))
    // on a well-formed deck, ntsfun equal to the real count is a no-op
    val wellFormed =
      """SWOF
        | 0.1 0.0 1.0 0.0
        | 1.0 1.0 0.0 0.0 /
        | 0.2 0.0 1.0 0.0
        | 1.0 1.0 0.0 0.0 /
        |/
        |""".stripMargin
    assert(Satfunc.df(spark, wellFormed, Some(2)).filter("SATNUM = 2").count() == 2)
  }

  test("pvt: explicit ntpvt splits concatenated PVDG tables") {
    val deck =
      """PVDG
        | 100 0.010 0.01
        | 200 0.005 0.02
        | 100 0.011 0.01
        | 200 0.006 0.02 /
        |/
        |""".stripMargin
    val split = Pvt.df(spark, deck, ntpvt = Some(2))
    assert(split.filter("PVTNUM = 1").count() == 2)
    assert(split.filter("PVTNUM = 2").count() == 2)
    assert(split.filter("PVTNUM = 2").orderBy("PRESSURE")
      .select("VOLUMEFACTOR").collect().map(_.getDouble(0)).toSeq == Seq(0.011, 0.006))
    val e = intercept[IllegalArgumentException](Pvt.df(spark, deck, Some(5)).count())
    assert(e.getMessage.contains("PVDG") && e.getMessage.contains("5"))
  }

  test("satfunc: defaulted (1*) values interpolate by saturation index, interior only") {
    val df = Satfunc.df(spark,
      """SWOF
        | 0.2 0.0 1.0 0.0
        | 0.4 1* 0.5 0.0
        | 0.6 0.6 1* 0.0
        | 1.0 1.0 0.0 1* /
        |/
        |""".stripMargin)
    val rows = df.orderBy("SW").collect()
    // KRW at SW=0.4 between (0.2, 0.0) and (0.6, 0.6) -> 0.3
    assert(math.abs(rows(1).getAs[Double]("KRW") - 0.3) < 1e-12)
    // KROW at SW=0.6 between (0.4, 0.5) and (1.0, 0.0) -> 0.5 + (-0.5)*(0.2/0.6)
    assert(math.abs(rows(2).getAs[Double]("KROW") - (0.5 - 0.5 * 0.2 / 0.6)) < 1e-12)
    // trailing default PCOW at SW=1.0 stays null (limit_area=inside)
    assert(rows(3).isNullAt(rows(3).fieldIndex("PCOW")))
  }

  test("faults: 3-D range unrolls to the cartesian cell set") {
    val df = Faults.df(spark,
      """FAULTS
        | 'F1' 1 2 3 3 1 2 'X' /
        |/
        |""".stripMargin)
    assert(df.count() == 4) // 2 * 1 * 2
    assert(df.filter("I = 2 AND J = 3 AND K = 1").count() == 1)
  }

  test("equil: one row per EQLNUM with defaults") {
    val df = Equil.df(spark,
      """EQUIL
        | 2000 200 2100 0.5 1700 0.3 /
        | 2100 210 2200 /
        |/
        |""".stripMargin)
    assert(df.count() == 2)
    val r2 = df.filter("EQLNUM = 2").collect().head
    assert(r2.getAs[Double]("PCOWC") == 0.0) // defaulted
    assert(r2.getAs[Double]("OWC") == 2200.0)
  }

  test("equil: contact column names follow the deck's phase configuration") {
    // reference test_equil.py::test_decks phase cases
    val gasWater = Equil.df(spark,
      "GAS\nWATER\n\nEQUIL\n 2000 200 2200 /\n")
    assert(gasWater.columns.contains("GWC") && !gasWater.columns.contains("OWC"))
    assert(gasWater.collect().head.getAs[Double]("GWC") == 2200.0)
    assert(!gasWater.columns.contains("GOC"))
    val gasOil = Equil.df(spark,
      "GAS\nOIL\n\nEQUIL\n 2000 200 2200 1 2100 3 /\n")
    assert(gasOil.collect().head.getAs[Double]("GOC") == 2100.0)
    assert(!gasOil.columns.contains("OWC") && !gasOil.columns.contains("GWC"))
    val oilWater = Equil.df(spark,
      "OIL\nWATER\n\nEQUIL\n 2000 200 2200 /\n")
    assert(oilWater.collect().head.getAs[Double]("OWC") == 2200.0)
    assert(!oilWater.columns.contains("GOC"))
  }

  test("pvt: PVTO empty-record counter splits PVTNUM tables") {
    val df = Pvt.df(spark,
      """PVTO
        | 50 100 1.1 1.0 /
        | 100 150 1.2 0.9 200 1.15 0.95 /
        | /
        | 60 110 1.05 1.1 /
        | /
        |DENSITY
        | 800 1000 1.1 /
        |/
        |""".stripMargin)
    val pvto = df.filter("KEYWORD = 'PVTO'")
    assert(pvto.count() == 4)
    assert(pvto.filter("PVTNUM = 1").count() == 3)
    assert(pvto.filter("PVTNUM = 2 AND RS = 60.0").count() == 1)
    assert(df.filter("KEYWORD = 'DENSITY'").count() == 1)
  }

  test("pvt: PVTG nested records (reference test_pvt.py::test_pvtg_string)") {
    // E100 manual example, as in the reference test
    val df = Pvt.df(spark,
      """PVTG
        |30 0.00014    0.0523 0.0234
        |   0          0.0521 0.0238 /
        |90 0.00012    0.0132 0.0252
        |   0          0.0131 0.0253 /
        |150 0.00015   0.00877 0.0281
        |   0          0.00861 0.0275 /
        |210 0.00019   0.00554 0.0318
        |    0         0.00555 0.0302 /
        |270 0.00029   0.00417 0.0355
        |    0         0.00421 0.0330 /
        |330 0.00049   0.00357 0.0392
        |    0         0.00361 0.0358 /
        |530 0.00060   0.00356 0.0393
        |    0         0.00360 0.0359 /
        |/
        |60 0.00014    0.0523 0.0234 /
        |120 0.00012   0.0132 0.0252 /
        |180 0.00015   0.00877 0.0281 /
        |240 0.00019   0.00554 0.0318 /
        |300 0.00029   0.00417 0.0355 /
        |360 0.00049   0.00357 0.0392 /
        |560 0.00060   0.00356 0.0393
        |    0         0.00360 0.0359 /
        |/
        |""".stripMargin).filter("KEYWORD = 'PVTG'")
    assert(Seq("PRESSURE", "OGR", "PVTNUM", "VOLUMEFACTOR", "VISCOSITY")
      .forall(df.columns.contains))
    assert(df.select("PVTNUM").distinct().count() == 2)
    assert(df.select("PRESSURE").distinct().count() == 14)
    assert(df.agg(org.apache.spark.sql.functions.max("VOLUMEFACTOR")).head.getDouble(0) == 0.0523)
    assert(df.agg(org.apache.spark.sql.functions.max("VISCOSITY")).head.getDouble(0) == 0.0393)
  }

  test("wcon: per-keyword frames union with in-effect dates") {
    val df = Wcon.df(spark,
      """DATES
        | 1 'JAN' 2000 /
        |/
        |WCONHIST
        | 'OP1' 'OPEN' 'ORAT' 100 10 1000 /
        |/
        |WCONINJE
        | 'WI1' 'WATER' 'OPEN' 'RATE' 500 /
        |/
        |""".stripMargin)
    assert(df.count() == 2)
    val hist = df.filter("KEYWORD = 'WCONHIST'").collect().head
    assert(hist.getAs[Double]("ORAT") == 100.0)
    assert(hist.getAs[java.sql.Timestamp]("DATE").toString.startsWith("2000-01-01"))
    assert(df.filter("KEYWORD = 'WCONINJE'").collect().head.getAs[Double]("RATE") == 500.0)
  }

  test("wcon: WCONINJH and schema defaults (reference test_wconhist/test_wconinjh)") {
    val df = Wcon.df(spark, "WCONHIST\n  'FOO' 0 1 /\n /\nWCONINJH\n  'BAR' 0 1 /\n /\n")
    val hist = df.filter("KEYWORD = 'WCONHIST'").collect().head
    assert(hist.getAs[String]("WELL") == "FOO")
    assert(hist.getAs[String]("STATUS") == "0" && hist.getAs[String]("CMODE") == "1")
    Seq("ORAT", "WRAT", "GRAT", "ALQ", "THP", "BHP", "NGLRAT").foreach(c =>
      assert(hist.getAs[Double](c) == 0.0, c))
    assert(hist.getAs[Int]("VFP_TABLE") == 0)
    val injh = df.filter("KEYWORD = 'WCONINJH'").collect().head
    assert(injh.getAs[String]("TYPE") == "0" && injh.getAs[String]("STATUS") == "1")
    assert(injh.isNullAt(injh.fieldIndex("RATE")))
    assert(injh.getAs[String]("CMODE") == "RATE") // defaulted item 12
  }

  test("gruptree: family-scoped node data, as-of snapshots, BRANPROP well filter") {
    val df = Gruptree.df(spark,
      """DATES
        | 1 'JAN' 2000 /
        |/
        |GRUPTREE
        | 'G1' 'FIELD' /
        |/
        |BRANPROP
        | 'B1' 'FIELD' /
        |/
        |NODEPROP
        | 'B1' 99.0 /
        |/
        |WELSPECS
        | 'OP1' 'G1' 5 5 1000 'OIL' /
        | 'OP2' 'B1' 6 6 1000 'OIL' /
        |/
        |DATES
        | 1 'FEB' 2000 /
        |/
        |GRUPNET
        | 'G1' 250.0 /
        |/
        |""".stripMargin)
    val jan = df.filter("DATE = timestamp'2000-01-01 00:00:00'").collect()
    val feb = df.filter("DATE = timestamp'2000-02-01 00:00:00'").collect()
    def row(rs: Array[org.apache.spark.sql.Row], child: String, kw: String) =
      rs.find(r => r.getAs[String]("CHILD") == child && r.getAs[String]("KEYWORD") == kw)
    // node data is family-scoped: NODEPROP's 99.0 lands on the BRANPROP
    // row only, never on the GRUPTREE row of another node
    assert(row(jan, "B1", "BRANPROP").get.getAs[Double]("TERMINAL_PRESSURE") == 99.0)
    val g1jan = row(jan, "G1", "GRUPTREE").get
    // as-of: GRUPNET defined in February must not appear in January
    assert(g1jan.isNullAt(g1jan.fieldIndex("TERMINAL_PRESSURE")))
    assert(row(feb, "G1", "GRUPTREE").get.getAs[Double]("TERMINAL_PRESSURE") == 250.0)
    // both wells join the snapshot (GRUPTREE tree keeps all WELSPECS)
    assert(row(jan, "OP1", "WELSPECS").isDefined && row(jan, "OP2", "WELSPECS").isDefined)

    // a BRANPROP-only deck: wells outside the network tree are dropped
    val bp = Gruptree.df(spark,
      """BRANPROP
        | 'B1' 'FIELD' /
        |/
        |WELSPECS
        | 'OP1' 'B1' 5 5 1000 'OIL' /
        | 'OP9' 'NOT_IN_TREE' 6 6 1000 'OIL' /
        |/
        |""".stripMargin)
    val wells = bp.filter("KEYWORD = 'WELSPECS'").collect().map(_.getAs[String]("CHILD"))
    assert(wells.contains("OP1"))
    // OP9's parent is outside the BRANPROP tree: it appears only via the
    // GRUPTREE family (synthesized under FIELD), not as a BRANPROP well
    assert(bp.filter("CHILD = 'NOT_IN_TREE' AND PARENT = 'FIELD'").count() == 1)
  }

  test("gruptree: full-tree snapshot per change date, last-wins reparenting") {
    val df = Gruptree.df(spark,
      """DATES
        | 1 'JAN' 2000 /
        |/
        |GRUPTREE
        | 'G1' 'FIELD' /
        | 'G2' 'G1' /
        |/
        |DATES
        | 1 'FEB' 2000 /
        |/
        |GRUPTREE
        | 'G2' 'FIELD' /
        |/
        |""".stripMargin)
    val jan = df.filter("DATE = timestamp'2000-01-01 00:00:00'")
    val feb = df.filter("DATE = timestamp'2000-02-01 00:00:00'")
    assert(jan.filter("CHILD = 'G2'").collect().head.getAs[String]("PARENT") == "G1")
    assert(feb.filter("CHILD = 'G2'").collect().head.getAs[String]("PARENT") == "FIELD")
    // root synthesized with null parent at both dates
    assert(jan.filter("CHILD = 'FIELD' AND PARENT IS NULL").count() == 1)
    assert(feb.filter("CHILD = 'FIELD' AND PARENT IS NULL").count() == 1)
    // snapshots carry the whole tree, not only the changed edges
    assert(feb.filter("CHILD = 'G1'").collect().head.getAs[String]("PARENT") == "FIELD")
  }
}
