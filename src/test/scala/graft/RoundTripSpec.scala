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
      r.getAs[Int]("TABLE_NUMBER"), r.getAs[Double]("PRESSURE"), r.getAs[Double]("WFR"),
      r.getAs[Double]("GFR"), r.getAs[Double]("ALQ"), r.getAs[Double]("RATE"),
      r.getAs[Double]("TAB"))
    assert(long1.collect().map(key).toSet == long2.collect().map(key).toSet)
    assert(long2.count() == 12)
  }

  test("df2res dispatcher routes mixed-keyword frames; satfunc round-trips") {
    val src =
      """SWOF
        |  0 0 1 1
        |  1 1 0 0
        |/
        |SGOF
        |  0 0 1 1
        |  1 1 0 0
        |/
        |""".stripMargin
    val df = graft.modules.Satfunc.df(spark, src)
    val text = IncludeWriter.df2res(df.orderBy("KEYWORD", "SATNUM"))
    assert(text.contains("SWOF") && text.contains("SGOF"))
    val back = graft.modules.Satfunc.df(spark, text)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("df2res EQUIL: bookkeeping columns stay out of the record; round-trips") {
    val src =
      """OIL
        |WATER
        |GAS
        |EQUIL
        | 2469 382.4 1700 0.0 1000 0.0 1 1 20 /
        | 2470 382.4 1705 0.0 1000 0.0 1 1 20 /
        |""".stripMargin
    val df = graft.modules.Equil.df(spark, src)
    val text = IncludeWriter.df2res(df)
    // first record item must be Z (2469), NOT the EQLNUM bookkeeping column
    val rec = DeckParser.parse(text).filter(e => e.keyword == "EQUIL" && e.items.nonEmpty)
    assert(rec.length == 2)
    assert(rec.head.items.head == "2469", s"EQLNUM leaked into the record: ${rec.head.items}")
    val back = graft.modules.Equil.df(spark, "OIL\nWATER\nGAS\n" + text)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("df2res mixed WCON frame: sibling keywords' null columns never emit") {
    val src =
      """DATES
        | 1 'JAN' 2000 /
        |/
        |WCONHIST
        | 'OP1' 'OPEN' 'ORAT' 100 50 1e6 /
        |/
        |WCONINJE
        | 'INJ1' 'WATER' 'OPEN' 'RATE' 200 /
        |/
        |""".stripMargin
    val df = graft.modules.Wcon.df(spark, src)
    val text = IncludeWriter.df2res(df)
    val events = DeckParser.parse(text)
    val inje = events.filter(e => e.keyword == "WCONINJE" && e.items.nonEmpty)
    assert(inje.length == 1)
    // WCONINJE schema: WELL TYPE STATUS CMODE RATE RESV BHP THP VFP_TABLE —
    // the union frame's ORAT/WRAT/GRAT columns (null here) must not appear
    assert(inje.head.items.take(5) == Vector("INJ1", "WATER", "OPEN", "RATE", "200"))
    val hist = events.filter(e => e.keyword == "WCONHIST" && e.items.nonEmpty).head
    assert(hist.items.take(6) == Vector("OP1", "OPEN", "ORAT", "100", "50", "1000000"))
    // keywords emit in order of first appearance in the frame (the frame
    // sorts by DATE, WELL so INJ1's row leads) — alphabetical order would
    // put WCONHIST first
    val kwOrder = events.filter(_.items.nonEmpty).map(_.keyword).distinct
    assert(kwOrder == Vector("WCONINJE", "WCONHIST"))
  }

  test("df2res PVTG: undersaturated lines emit in descending OGR; no-PVTNUM defaults to region 1") {
    val src =
      """PVTG
        |30 0.00014 0.0523 0.0234
        |   0       0.0521 0.0238 /
        |/
        |""".stripMargin
    val df = graft.modules.Pvt.df(spark, src)
    // force a shuffled lineage so collect order is NOT the input order
    val text = IncludeWriter.df2res(df.repartition(8))
    val back = graft.modules.Pvt.df(spark, text)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // first undersaturated line of the record is the saturated (highest) OGR
    val dataLine = text.linesIterator.find(l => l.trim.startsWith("30")).get
    assert(dataLine.trim.split("\\s+")(1).toDouble == 0.00014)
    // PVTO/PVTG frames without PVTNUM still go through the nested writer
    val noRegion = IncludeWriter.df2res(df.drop("PVTNUM"))
    val back2 = graft.modules.Pvt.df(spark, noRegion)
    assert(back2.filter("KEYWORD = 'PVTG'").count() == 2)
  }

  test("df2res PVTO/PVTG: nested writer keeps region separators; round-trips") {
    val src =
      """PVTO
        |  10 100 1.1 0.5
        |     200 1.05 0.6 /
        |  20 150 1.2 0.4 /
        |/
        |  15 120 1.15 0.45 /
        |/
        |""".stripMargin
    val df = graft.modules.Pvt.df(spark, src)
    val text = IncludeWriter.df2res(df)
    val back = graft.modules.Pvt.df(spark, text)
    // both PVTNUM regions survive the round-trip (the generic path would
    // have dropped the region column and merged everything into region 1)
    assert(back.filter("KEYWORD = 'PVTO'").select("PVTNUM").distinct().count() == 2)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("df2res comments and consecutive-region validation (reference dispatcher args)") {
    val src =
      """SWOF
        |  0 0 1 1
        |  1 1 0 0
        |/
        |""".stripMargin
    val df = graft.modules.Satfunc.df(spark, src)
    val text = IncludeWriter.df2res(df,
      comments = Map("master" -> "exported by graft", "SWOF" -> "water-oil table"),
      consecutive = Some("SATNUM"))
    assert(text.startsWith("-- exported by graft\n"))
    assert(text.contains("-- water-oil table\nSWOF"))
    // gapped SATNUM (2 only, no 1) must be refused
    val gapped = df.withColumn("SATNUM",
      org.apache.spark.sql.functions.col("SATNUM") + 1)
    assertThrows[IllegalArgumentException](
      IncludeWriter.df2res(gapped, consecutive = Some("SATNUM")))
  }

  test("df2res honors an explicit keyword-order argument") {
    val src =
      """SWOF
        |  0 0 1 1
        |  1 1 0 0
        |/
        |SGOF
        |  0 0 1 1
        |  1 1 0 0
        |/
        |""".stripMargin
    val df = graft.modules.Satfunc.df(spark, src)
    val text = IncludeWriter.df2res(df, keywords = Some(Seq("SGOF", "SWOF")))
    assert(text.indexOf("SGOF") >= 0 && text.indexOf("SGOF") < text.indexOf("SWOF"))
    // keywords absent from the frame are skipped, not errored
    val text2 = IncludeWriter.df2res(df, keywords = Some(Seq("SWOF", "PVTO")))
    assert(text2.contains("SWOF") && !text2.contains("PVTO"))
  }

  test("EDITNNC round-trip: multiplier frame -> include text -> parse -> same") {
    val nnc = Seq((1, 1, 1, 2, 1, 1, 0.5), (3, 4, 5, 3, 4, 6, 0.1))
      .toDF("I1", "J1", "K1", "I2", "J2", "K2", "TRANM")
    val text = IncludeWriter.editnnc(nnc)
    val back = DeckParser.parse(text).filter(e => e.keyword == "EDITNNC" && e.items.nonEmpty)
    assert(back.length == 2)
    assert(back.map(_.items.take(6).map(_.toInt)).toSet ==
      Set(Seq(1, 1, 1, 2, 1, 1), Seq(3, 4, 5, 3, 4, 6)))
    assert(back.map(_.items(6).toDouble).toSet == Set(0.5, 0.1))
  }

  test("SWOF table round-trip: df -> include text -> parse -> same tables") {
    // reference satfunc df2res_swof round-trip (test_satfunc.py::test_satfunc_roundtrip)
    val src =
      """SWOF
        |  0 0 1 1
        |  0.5 0.3 0.4 0.2
        |  1 1 0 0
        |/
        |  0 0 1 1
        |  1 1 0 0
        |/
        |""".stripMargin
    val df = graft.modules.Satfunc.df(spark, src)
    val text = IncludeWriter.tableKeyword(
      df.orderBy("SATNUM", "SW"), "SWOF", "SATNUM", Seq("SW", "KRW", "KROW", "PCOW"))
    val back = graft.modules.Satfunc.df(spark, text)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("UNSMRY binary round-trip: long form -> SMSPEC/UNSMRY -> read -> same (S16)") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-smry").toString + "/CASE"
    val df = Seq(
      ("2020-01-01", "FOPR", 1250.5), ("2020-01-01", "WOPR:OP_1", 300.25),
      ("2020-02-01", "FOPR", 1100.0), ("2020-02-01", "WOPR:OP_1", 290.5),
      ("2020-03-01", "FOPR", 990.75), ("2020-03-01", "WOPR:OP_1", 0.0))
      .toDF("DATE", "VECTOR", "VALUE")
      .withColumn("DATE", to_date(col("DATE")))
    val order = graft.write.SummaryWriter.write(df, base)
    assert(order == Seq("TIME", "FOPR", "WOPR:OP_1"))
    val back = graft.write.SummaryWriter.read(spark, base)
      .withColumn("VALUE", round(col("VALUE"), 2)) // float32 storage precision
    val expected = df.withColumn("VALUE", round(col("VALUE"), 2))
    assert(back.count() == 6)
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
    // file structure: SMSPEC starts with a 16-byte header record framing
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.SMSPEC"))
    assert(bytes(3) == 16 && new String(bytes.slice(4, 10), "ASCII") == "DIMENS")
  }

  test("csv2res summary: wide CSV -> binary SMSPEC/UNSMRY -> read -> same frame") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv2sum").toString
    // wide CSV exactly like Res2Csv's summary module emits
    val csv = s"$dir/in.csv"
    // the 2020-03-01 WOPR cell is EMPTY (sparse exports must take the
    // dense-0.0 default, not NPE) and the 2020-04-01 row is ALL empty
    // (its report step must survive, not silently drop off the time axis)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "DATE,FOPR,WOPR:OP_1\n2020-01-01,1250.5,300.25\n2020-02-01,1100.0,290.5\n" +
        "2020-03-01,990.75,\n2020-04-01,,\n")
    val order = graft.cli.Csv2Res.summaryCsvToBinary(spark, csv, s"$dir/CASE")
    assert(order == Seq("TIME", "FOPR", "WOPR:OP_1"))
    val back = graft.write.SummaryWriter.read(spark, s"$dir/CASE")
      .withColumn("VALUE", round(col("VALUE"), 2))
    val expected = Seq(
      ("2020-01-01", "FOPR", 1250.5), ("2020-01-01", "WOPR:OP_1", 300.25),
      ("2020-02-01", "FOPR", 1100.0), ("2020-02-01", "WOPR:OP_1", 290.5),
      ("2020-03-01", "FOPR", 990.75), ("2020-03-01", "WOPR:OP_1", 0.0),
      ("2020-04-01", "FOPR", 0.0), ("2020-04-01", "WOPR:OP_1", 0.0))
      .toDF("DATE", "VECTOR", "VALUE")
      .withColumn("DATE", to_date(col("DATE")))
      .withColumn("VALUE", round(col("VALUE"), 2))
    assert(back.count() == 8)
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
  }

  test("csv2res summary: malformed DATE cell fails loudly (not an NPE downstream)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv2sum-bad").toString
    val csv = s"$dir/in.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "DATE,FOPR\n2020-01-01,1.0\nnot-a-date,2.0\n")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Csv2Res.summaryCsvToBinary(spark, csv, s"$dir/CASE")
    }
    assert(e.getMessage.contains("not-a-date"))
    val csv2 = s"$dir/in2.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv2),
      "DATE,FOPR\n2020-01-01,1.0\n2020-02-01,N/A\n")
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Csv2Res.summaryCsvToBinary(spark, csv2, s"$dir/CASE2")
    }
    assert(e2.getMessage.contains("N/A") && e2.getMessage.contains("FOPR"))
    // EMPTY date cell: same loud failure, not an NPE in the writer
    val csv3 = s"$dir/in3.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv3),
      "DATE,FOPR\n2020-01-01,1.0\n,2.0\n")
    val e3 = intercept[IllegalArgumentException] {
      graft.cli.Csv2Res.summaryCsvToBinary(spark, csv3, s"$dir/CASE3")
    }
    assert(e3.getMessage.toLowerCase.contains("date"))
  }

  test("csv2res typed-subcommand args: output path survives without --keywords") {
    import graft.cli.Csv2Res.parseTypedArgs
    assert(parseTypedArgs(Seq("out.inc"), "solution.inc") == (None, "out.inc"))
    assert(parseTypedArgs(Seq(), "solution.inc") == (None, "solution.inc"))
    assert(parseTypedArgs(Seq("--keywords", "EQUIL", "out.inc"), "solution.inc") ==
      (Some(Seq("EQUIL")), "out.inc"))
    assert(parseTypedArgs(Seq("out.inc", "--keywords", "EQUIL,RSVD"), "solution.inc") ==
      (Some(Seq("EQUIL", "RSVD")), "out.inc"))
  }

  test("RESTART pointer: >72 chars or embedded space fails loudly at write") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-bad").toString
    val frame = Seq(("2020-01-01", "FOPR", 1.0)).toDF("DATE", "VECTOR", "VALUE")
      .withColumn("DATE", to_date(col("DATE")))
    val tooLong = "p/" * 40  // 80 chars
    assert(intercept[IllegalArgumentException] {
      graft.write.SummaryWriter.write(frame, s"$dir/A", restartFrom = Some(tooLong))
    }.getMessage.contains("72"))
    assert(intercept[IllegalArgumentException] {
      graft.write.SummaryWriter.write(frame, s"$dir/B", restartFrom = Some("MY CASE"))
    }.getMessage.contains("space"))
  }

  test("RESTART pointer round-trips and chains parent history (include_restart)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-restart").toString
    def frame(rows: Seq[(String, Double)]) =
      rows.map { case (d, v) => (d, "FOPR", v) }.toDF("DATE", "VECTOR", "VALUE")
        .withColumn("DATE", to_date(col("DATE")))
    // parent runs Jan-Mar; child restarts from it in Mar (overlapping
    // date must come from the CHILD, pre-restart history from the parent)
    graft.write.SummaryWriter.write(
      frame(Seq("2020-01-01" -> 1.0, "2020-02-01" -> 2.0, "2020-03-01" -> 99.0)),
      s"$dir/PARENT")
    graft.write.SummaryWriter.write(
      frame(Seq("2020-03-01" -> 3.0, "2020-04-01" -> 4.0)),
      s"$dir/CHILD", restartFrom = Some("PARENT"))
    assert(graft.write.SummaryWriter.restartParent(s"$dir/CHILD")
      .contains(s"$dir/PARENT"))
    assert(graft.write.SummaryWriter.restartParent(s"$dir/PARENT").isEmpty)
    val chained = graft.modules.Summary.chainRestart(
      graft.write.SummaryWriter.read(spark, s"$dir/PARENT"),
      graft.write.SummaryWriter.read(spark, s"$dir/CHILD"))
      .orderBy("DATE").collect()
      .map(r => r.getDate(0).toString -> r.getDouble(2))
    assert(chained.toSeq == Seq("2020-01-01" -> 1.0, "2020-02-01" -> 2.0,
      "2020-03-01" -> 3.0, "2020-04-01" -> 4.0))
  }

  test("Res2Csv file output streams via df.write.csv and lands as ONE csv file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-csv").toString
    val df = (1 to 1000).map(i => (i, s"w$i", i * 1.5)).toDF("I", "WELL", "V")
    val out = s"$dir/out.csv"
    graft.cli.Res2Csv.writeCsvFile(df, out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == 1000)
    assert(back.columns.toSeq == Seq("I", "WELL", "V"))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // single visible artifact: the tmp write dir and its part files are gone
    assert(new java.io.File(dir).listFiles().map(_.getName).toSeq == Seq("out.csv"))
  }

  test("csv2res typed subcommands: equil/pvt/satfunc CSV round-trips through df2res") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv2res").toString
    // module frame -> CSV file -> typed subcommand core -> include text
    def viaCsv(df: org.apache.spark.sql.DataFrame, region: String,
        kws: Option[Seq[String]] = None): String = {
      val p = s"$dir/$region.csv"
      val cols = df.columns
      val rows = df.collect().map(r => cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("")).mkString(","))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        (cols.mkString(",") +: rows).mkString("\n") + "\n")
      val back = spark.read.option("header", "true")
        .option("inferSchema", "true").csv(p)
      graft.cli.Csv2Res.typedCsvToInclude(back, region, kws)
    }
    // equil (test_equil.py df2res round trips)
    val eq = graft.modules.Equil.df(spark,
      "EQUIL\n 2000 300 2100 0.5 /\n 2050 310 2150 0.7 /\n")
    val eqBack = graft.modules.Equil.df(spark, viaCsv(eq, "EQLNUM"))
    assert(eqBack.exceptAll(eq).isEmpty && eq.exceptAll(eqBack).isEmpty)
    // pvt (test_pvt.py df2res round trips): two keyword families mixed
    val pvt = graft.modules.Pvt.df(spark,
      "DENSITY\n 800 1000 1.2 /\n 820 1010 1.3 /\nPVTW\n 200 1.03 4e-5 0.3 0 /\n 210 1.04 5e-5 0.4 0 /\n")
    val pvtBack = graft.modules.Pvt.df(spark, viaCsv(pvt, "PVTNUM"))
    assert(pvtBack.exceptAll(pvt).isEmpty && pvt.exceptAll(pvtBack).isEmpty)
    // satfunc (test_satfunc.py round trips) + the --keywords filter
    val sat = graft.modules.Satfunc.df(spark,
      "SWOF\n 0 0 1 1\n 0.5 0.3 0.4 0.2\n 1 1 0 0\n/\nSGFN\n 0 0 1\n 1 1 0\n/\n")
    val satBack = graft.modules.Satfunc.df(spark, viaCsv(sat, "SATNUM"))
    assert(satBack.exceptAll(sat).isEmpty && sat.exceptAll(satBack).isEmpty)
    val swofOnly = viaCsv(sat, "SATNUM", Some(Seq("SWOF")))
    assert(swofOnly.contains("SWOF") && !swofOnly.contains("SGFN"))
    // KEYWORD column is mandatory for the typed route
    intercept[IllegalArgumentException](
      graft.cli.Csv2Res.typedCsvToInclude(eq.drop("KEYWORD"), "EQLNUM", None))
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
