package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.EclBinary
import graft.write.SummaryWriter

/** Binary EGRID/INIT/UNRST/RFT/UNSMRY decode against the reference's real
  * simulator artifacts: the analytic eightcells model (2×2×2 grid of
  * exact 50×50×50 m cells — every geometric quantity is known in closed
  * form) and the full-field Reek EGRID/RFT (row properties documented in
  * the reference's tests/test_grid.py and tests/test_rft.py).
  */
class EclBinarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val EightCells = "/root/reference/tests/data/eightcells/EIGHTCELLS"
  private val ReekModel = "/root/reference/tests/data/reek/eclipse/model/2_R001_REEK-0"

  test("eightcells EGRID: exact geometry of the analytic 2x2x2 grid") {
    val g = EclBinary.egrid(spark, s"$EightCells.EGRID").orderBy("ACTIVE_IDX")
    assert(g.count() == 8)
    val rows = g.collect()
    // active order == global order on an all-active grid
    assert(rows.map(_.getAs[Long]("GLOBAL_INDEX")).toSeq == (0L until 8L))
    assert(rows.map(_.getAs[Long]("ACTIVE_IDX")).toSeq == (0L until 8L))
    rows.foreach { r =>
      val (i, j, k) = (r.getAs[Int]("I"), r.getAs[Int]("J"), r.getAs[Int]("K"))
      assert(math.abs(r.getAs[Double]("X") - (i * 50.0 - 25.0)) < 1e-9)
      assert(math.abs(r.getAs[Double]("Y") - (j * 50.0 - 25.0)) < 1e-9)
      assert(math.abs(r.getAs[Double]("Z") - (k * 50.0 - 25.0)) < 1e-9)
      assert(math.abs(r.getAs[Double]("VOLUME") - 125000.0) < 1e-6)
      assert(r.getAs[Double]("Z_MIN") == (k - 1) * 50.0)
      assert(r.getAs[Double]("Z_MAX") == k * 50.0)
    }
  }

  test("eightcells INIT: per-cell vectors of active length") {
    val init = EclBinary.init(spark, s"$EightCells.INIT")
    assert(init.count() == 8)
    for (c <- Seq("PORO", "PERMX", "PORV", "SATNUM"))
      assert(init.columns.contains(c), s"missing $c in ${init.columns.mkString(",")}")
    // table payloads must not leak in as columns
    for (c <- Seq("TAB", "TABDIMS", "INTEHEAD")) assert(!init.columns.contains(c))
    assert(init.filter(col("PORV") <= 0).count() == 0)
    assert(init.schema("SATNUM").dataType.typeName == "integer")
  }

  test("eightcells UNRST: DATE-stacked restart vectors") {
    val rst = EclBinary.unrst(spark, s"$EightCells.UNRST")
    val dates = rst.select("DATE").distinct().orderBy("DATE")
      .as[java.sql.Date].collect().map(_.toString)
    assert(dates.toSeq == Seq("2000-01-01", "2000-01-02", "2000-01-03")) // TSTEP 1 1
    assert(rst.count() == 3 * 8)
    assert(rst.columns.contains("PRESSURE") && rst.columns.contains("SWAT"))
    assert(rst.filter(col("SWAT") < 0 || col("SWAT") > 1).count() == 0)
    // vector selection narrows the frame
    val only = EclBinary.unrst(spark, s"$EightCells.UNRST", Seq("PRESSURE"))
    assert(only.columns.toSet == Set("DATE", "ACTIVE_IDX", "PRESSURE"))
  }

  test("eightcells RFT: connection rows and segment topology feed Rft ops") {
    val con = EclBinary.rft(spark, s"$EightCells.RFT")
    assert(con.count() >= 1)
    for (c <- Seq("DATE", "WELL", "CONIDX", "CONIPOS", "CONJPOS", "CONKPOS",
        "DEPTH", "PRESSURE"))
      assert(con.columns.contains(c), s"missing $c in ${con.columns.mkString(",")}")
    assert(con.select("WELL").distinct().as[String].collect().toSet == Set("OP1"))
    val seg = EclBinary.rftSeg(spark, s"$EightCells.RFT")
    assert(seg.count() >= 2) // the multiseg well has 2 segments per report
    assert(seg.columns.contains("SEGIDX") && seg.columns.contains("SEGNXT"))
    // the decoded segment frame drives the existing topology operator
    val topo = graft.modules.Rft.processSegTopology(
      seg.filter(col("DATE") === seg.agg(min("DATE")).head.getDate(0)))
    assert(topo.count() >= 2)
    assert(topo.columns.contains("LEAF") && topo.columns.contains("JUNCTION"))
  }

  test("eightcells UNSMRY reads through the catalog naming rules") {
    val df = SummaryWriter.read(spark, EightCells)
    assert(df.count() > 0)
    val vecs = df.select("VECTOR").distinct().as[String].collect().toSet
    assert(!vecs.contains("TIME"), "TIME is the clock, not a vector")
    assert(vecs.exists(_.startsWith("F")), s"no field vector in $vecs")
    // well vectors carry the WGNAME qualifier
    assert(vecs.filter(_.startsWith("W")).forall(_.contains(":")), s"$vecs")
  }

  test("eightcells end-to-end: assemble obeys the reference laws; trans + pillars run") {
    // the reference's own consistency law over the same shipped binaries
    // (test_grid.py::test_grid_df): PORV reconciles with PORO×VOLUME
    val geom = EclBinary.egrid(spark, s"$EightCells.EGRID")
    val init = EclBinary.init(spark, s"$EightCells.INIT")
    val grid = graft.modules.GridOps.assemble(geom, Some(init), None)
    val r = grid.agg(
      sum(abs(col("PORO") * col("VOLUME") * col("NTG") - col("PORV"))).as("err"),
      sum(col("PORV")).as("porv")).head
    assert(r.getDouble(0) / r.getDouble(1) < 1e-5)
    // trans over REAL binary TRAN vectors (test_trans.py::test_trans
    // properties): direction set, positivity, closed-form pair counts
    val tr = graft.modules.GridOps.trans(grid, vectors = Seq("FIPNUM"))
    val byDir = tr.groupBy("DIR").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byDir.keySet.subsetOf(Set("I", "J", "K")))
    assert(tr.filter(col("TRAN") <= 0).count() == 0)
    def positives(c: String, edge: String, lim: Int) =
      grid.filter(col(c) > 0 && col(edge) < lim).count()
    assert(byDir.getOrElse("I", 0L) == positives("TRANX", "I", 2))
    assert(byDir.getOrElse("J", 0L) == positives("TRANY", "J", 2))
    assert(byDir.getOrElse("K", 0L) == positives("TRANZ", "K", 2))
    // pillars over the assembled frame: 2×2 pillars of 2 cells, PORO
    // pore-volume-weighted
    val p = graft.modules.Pillars.df(grid).collect()
    assert(p.length == 4)
    assert(p.forall(_.getAs[Long]("N_CELLS") == 2L))
    p.foreach(row => assert(math.abs(row.getAs[Double]("PORO") -
      row.getAs[Double]("PORV") / row.getAs[Double]("VOLUME")) < 1e-12))
  }

  test("timesteps: TIMESTEP vector separates collapsed sub-daily report dates") {
    // real simulator cases for the reference's duplicate-date subsystem
    // (test_summary.py::test_unique_datetime_for_short_timesteps): the
    // day-resolution DATE collapses sub-daily steps into duplicates
    def dupes(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("VECTOR", "DATE").count().filter(col("count") > 1).count()
    val dir = "/root/reference/tests/data/timesteps"
    val bare = SummaryWriter.readWithStep(spark, s"$dir/SHORT_STEP")
    assert(dupes(bare) > 0, "SHORT_STEP must exhibit collapsed dates")
    // without a TIMESTEP vector the recovery refuses, like the
    // reference's ValueError
    assertThrows[IllegalArgumentException](
      graft.modules.Summary.dedupDatesWithTimestep(bare, "DAYS"))
    // with it, every duplicate separates by its own step length in the
    // SMSPEC-declared unit
    val base = s"$dir/SHORT_STEP_WITH_TIMESTEP"
    val unit = SummaryWriter.vectorUnit(base, "TIMESTEP").get
    val withStep = SummaryWriter.readWithStep(spark, base)
    assert(dupes(withStep) > 0)
    val fixed = graft.modules.Summary.dedupDatesWithTimestep(withStep, unit)
    assert(dupes(fixed) == 0)
    assert(fixed.count() == withStep.filter(col("VECTOR") =!= "TIMESTEP").count())
  }

  test("duplicated summary vectors collapse value-exactly in the wide form") {
    // the reference's test_duplicated_summary_vectors case: a deck with
    // FOPR twice in SUMMARY ships the vector twice per report step;
    // summary.py:418-425 drops the duplicate column. The long form reads
    // both copies; because they carry identical values the wide pivot's
    // collapse is value-exact, matching the reference's first-wins drop.
    val base = "/root/reference/tests/data/eightcells/" +
      "eightcells_duplicated_summary_vector/EIGHTCELLS_DUPES"
    val long = SummaryWriter.read(spark, base)
    val fopr = long.filter(col("VECTOR") === "FOPR")
    assert(fopr.groupBy("DATE").count().filter(col("count") =!= 2).count() == 0,
      "expected the vector duplicated once per report step")
    assert(fopr.groupBy("DATE").agg(countDistinct("VALUE").as("n"))
      .filter(col("n") =!= 1).count() == 0, "duplicate copies must agree")
    val wide = graft.modules.Summary.toWide(long, Seq("FOPR"))
    assert(wide.columns.toSeq == Seq("DATE", "FOPR"))
    assert(wide.count() == long.select("DATE").distinct().count())
  }

  test("Reek EGRID: full-field frame has the documented active-cell count") {
    val g = EclBinary.egrid(spark, s"$ReekModel.EGRID")
    assert(g.count() == 35817) // 40*64*14 = 35840 cells, 23 inactive
    val agg = g.agg(max("I"), max("J"), max("K"),
      min("VOLUME"), min("Z_MIN"), max("Z_MAX")).head
    assert((agg.getInt(0), agg.getInt(1), agg.getInt(2)) == ((40, 64, 14)))
    assert(agg.getDouble(3) > 0, "every cell volume must be positive")
    assert(agg.getDouble(4) > 1000 && agg.getDouble(5) < 3000,
      "Reek reservoir depth is ~1500-1900 m")
    // zonemap merge over the real grid: every K layer 1..14 is zoned
    val zonemap = graft.modules.GridOps.parseLyr(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"${ReekModel.stripSuffix("2_R001_REEK-0")}zones.lyr"))))
    val zoned = graft.modules.GridOps.mergeZones(g, zonemap)
    assert(zoned.filter(col("ZONE").isNull).count() == 0)
  }

  test("eclipse-egrid DSv2: format read equals the library read, pruning skips INIT") {
    // the registered format and the library fleet read share the
    // per-case kernel — equal row for row on the real artifact
    val viaFormat = spark.read.format("eclipse-egrid")
      .option("vectors", "PORO,PERMX")
      .load(s"$EightCells.EGRID").orderBy("ACTIVE_IDX").collect()
    val lib = EclBinary.gridFleet(spark, s"$EightCells.EGRID", Seq("PORO", "PERMX"))
      .orderBy("ACTIVE_IDX").collect()
    assert(viaFormat.length == 8 && viaFormat.toSeq == lib.toSeq)
    // byte-level column pruning: an EGRID with NO INIT beside it scans
    // fine as long as no INIT vector column survives pruning (the
    // pruned scan never opens the INIT file) — and the vector column
    // genuinely requires it
    val tmp = java.nio.file.Files.createTempDirectory("egrid-noinit")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$EightCells.EGRID"),
      tmp.resolve("LONE.EGRID"))
    val lone = spark.read.format("eclipse-egrid").option("vectors", "PORO")
      .load(s"$tmp/LONE.EGRID")
    assert(lone.select("CASE", "I", "J", "K", "ACTIVE_IDX").count() == 8)
    intercept[org.apache.spark.SparkException] {
      lone.select("PORO").collect()
    }
    // a bare directory load lists its .EGRID members (the extension
    // threads into directory expansion — not the deck source's .DATA)
    val dirLoad = spark.read.format("eclipse-egrid").option("vectors", "PORO")
      .load("/root/reference/tests/data/eightcells")
    assert(dirLoad.count() == 8)
  }

  test("eclipse-unsmry/rft DSv2: format reads equal the library reads on real artifacts") {
    // UNSMRY: the format and corpusFromPath share summaryCaseTuples —
    // row-identical on the real eightcells summary (incl. UNRST/RFT
    // siblings the extension filter must skip)
    val viaFormat = spark.read.format("eclipse-unsmry")
      .load(s"$EightCells.UNSMRY")
      .orderBy("VECTOR", "STEP").collect()
    val lib = graft.write.SummaryWriter.corpusFromPath(spark, s"$EightCells.UNSMRY")
      .orderBy("VECTOR", "STEP").collect()
    assert(viaFormat.nonEmpty && viaFormat.toSeq == lib.toSeq)
    // RFT: shared rftCaseRows on the real Reek RFT (OP_1 reports)
    val reekRft = s"$ReekModel.RFT"
    val fmtRft = spark.read.format("eclipse-rft")
      .option("vectors", "DEPTH,PRESSURE").load(reekRft)
      .orderBy("DATE", "WELL", "CONIDX").collect()
    val libRft = EclBinary.rftFleet(spark, reekRft, Seq("DEPTH", "PRESSURE"))
      .orderBy("DATE", "WELL", "CONIDX").collect()
    assert(fmtRft.nonEmpty && fmtRft.toSeq == libRft.toSeq)
  }

  test("NNC TRANNNC attachment round-trips through the ecl_kw writer") {
    import graft.io.EclKw
    import graft.io.EclKw.Kw
    // synthetic 3x2x1 grid: NNC1/NNC2 pair cells (1,1,1)<->(3,2,1), and
    // an INIT carrying the matching TRANNNC vector (no shipped dataset
    // has BOTH NNCs and an INIT, so the writer builds the fixture)
    val d = java.nio.file.Files.createTempDirectory("graft-nnc").toString
    EclKw.write(s"$d/T.EGRID", Seq(
      Kw("GRIDHEAD", "INTE", Array(0, 3, 2, 1)),
      Kw("NNC1", "INTE", Array(1, 2)),
      Kw("NNC2", "INTE", Array(6, 5))))
    val ih = Array.fill(95)(0)
    ih(8) = 3; ih(9) = 2; ih(10) = 1; ih(11) = 6
    EclKw.write(s"$d/T.INIT", Seq(
      Kw("INTEHEAD", "INTE", ih),
      Kw("TRANNNC", "REAL", Array(12.5f, 7.25f))))
    val nnc = graft.io.EclBinary.nnc(spark, s"$d/T.EGRID", Some(s"$d/T.INIT"))
      .orderBy("I1").collect()
    // global 1 -> (1,1,1), 6 -> (3,2,1); global 2 -> (2,1,1), 5 -> (2,2,1)
    assert(nnc.map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
      r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6))).toSeq ==
      Seq((1, 1, 1, 3, 2, 1, 12.5), (2, 1, 1, 2, 2, 1, 7.25)))
  }

  test("vector globs and rstdates reach the binary reads (reference --vectors)") {
    // INIT: a P* glob keeps only P-vectors (+ACTIVE_IDX); others are
    // seeked past, never decoded
    val init = graft.io.EclBinary.init(spark, s"$EightCells.INIT", Seq("P*"))
    assert(init.columns.head == "ACTIVE_IDX")
    val vecCols = init.columns.filterNot(_ == "ACTIVE_IDX")
    assert(vecCols.nonEmpty && vecCols.forall(_.startsWith("P")))
    assert(init.count() == 8)

    // UNRST: the INTEHEAD-only pre-scan lists the report dates; a
    // dates filter decodes ONLY the selected step
    val dates = graft.io.EclBinary.unrstDates(s"$EightCells.UNRST")
    assert(dates.length >= 2 && dates == dates.sorted)
    val last = graft.io.EclBinary.unrst(spark, s"$EightCells.UNRST",
      dates = dates.takeRight(1))
    assert(last.select("DATE").distinct().count() == 1)
    assert(last.count() == 8)
    val all = graft.io.EclBinary.unrst(spark, s"$EightCells.UNRST")
    assert(all.count() == 8L * dates.length)
  }

  test("MAPAXES applies on request: rotated axes move cell centers exactly") {
    import graft.io.EclKw
    import graft.io.EclKw.Kw
    // 1x1x1 unit-square cell, depth 0..5 → local center (0.5, 0.5, 2.5);
    // MAPAXES: origin (100,200), X axis toward +y, Y axis toward -x (a
    // 90° rotation) → global center (99.5, 200.5), Z and VOLUME unchanged
    val d = java.nio.file.Files.createTempDirectory("graft-mapaxes").toString
    val coord = Array(
      0f, 0f, 0f, 0f, 0f, 10f, 1f, 0f, 0f, 1f, 0f, 10f,
      0f, 1f, 0f, 0f, 1f, 10f, 1f, 1f, 0f, 1f, 1f, 10f)
    val zcorn = Array(0f, 0f, 0f, 0f, 5f, 5f, 5f, 5f)
    EclKw.write(s"$d/M.EGRID", Seq(
      Kw("GRIDHEAD", "INTE", Array(0, 1, 1, 1)),
      Kw("MAPAXES", "REAL", Array(99f, 200f, 100f, 200f, 100f, 201f)),
      Kw("COORD", "REAL", coord),
      Kw("ZCORN", "REAL", zcorn),
      Kw("ACTNUM", "INTE", Array(1))))
    val local = graft.io.EclBinary.egrid(spark, s"$d/M.EGRID").collect().head
    assert(local.getDouble(3) == 0.5 && local.getDouble(4) == 0.5)
    val mapped = graft.io.EclBinary.egrid(spark, s"$d/M.EGRID",
      applyMapaxes = true).collect().head
    assert(math.abs(mapped.getDouble(3) - 99.5) < 1e-9)
    assert(math.abs(mapped.getDouble(4) - 200.5) < 1e-9)
    assert(mapped.getDouble(5) == 2.5)                  // Z untouched
    assert(math.abs(mapped.getDouble(8) - 5.0) < 1e-9)  // VOLUME rigid
  }

  test("Reek NNC: EGRID pair list decodes, TRAN null without INIT") {
    val nnc = graft.io.EclBinary.nnc(spark, s"$ReekModel.EGRID", None)
    assert(nnc.count() == 3286) // NNC1/NNC2 length in the Reek EGRID
    assert(nnc.filter(col("TRAN").isNotNull).count() == 0)
    assert(nnc.filter(col("I1") < 1 || col("I1") > 40 || col("K2") > 14).count() == 0)
    // Reek's NNCs all cross faults — none connect vertically stacked cells
    val vert = graft.modules.GridOps.filterVerticalNnc(nnc)
    assert(vert.count() == 0)
  }

  test("CLI path modules run end-to-end on the binary artifacts") {
    import graft.cli.Res2Csv.PathModules
    val data8 = s"$EightCells.DATA"
    // grid: geometry ⟗ INIT ⟗ stacked restart = 8 cells × 3 dates
    val grid = PathModules("grid")(spark, data8)
    assert(grid.count() == 24)
    for (c <- Seq("I", "J", "K", "VOLUME", "PORO", "PRESSURE", "DATE"))
      assert(grid.columns.contains(c), s"grid missing $c")
    // pillars and trans run over the STATIC frame (no restart stacking):
    // every connection appears exactly once, not once per report date
    assert(PathModules("pillars")(spark, data8).count() > 0)
    val trans = PathModules("trans")(spark, data8)
    assert(trans.count() > 0)
    assert(trans.select("DIR").distinct().as[String].collect().toSet.subsetOf(Set("I", "J", "K")))
    assert(trans.groupBy("I1", "J1", "K1", "DIR").count()
      .filter(col("count") > 1).count() == 0,
      "trans rows must not be multiplied by restart dates")
    // summary: wide frame, DATE + one column per vector
    val summary = PathModules("summary")(spark, data8)
    assert(summary.columns.head == "DATE" && summary.columns.length > 3)
    assert(summary.count() > 0)
    // wellconnstatus: the CPI:OP1:i,j,k vector yields OP1's single OPEN
    val wcs = PathModules("wellconnstatus")(spark, data8).collect()
    assert(wcs.map(_.toSeq.drop(1)).toSeq == Seq(Seq("OP1", 1, 1, 1, "OPEN")))
    // wellcompletiondata: the eightcells zones.lyr (Upper=K1, Lower=K2)
    // rolls OP1's single K=1 completion into the Upper zone
    val wcd8 = PathModules("wellcompletiondata")(spark, data8).collect()
    assert(wcd8.length == 1 &&
      wcd8.head.getAs[String]("WELL") == "OP1" &&
      wcd8.head.getAs[String]("ZONE") == "Upper")
    val wcd = PathModules("wellcompletiondata")(spark, s"$ReekModel.DATA")
    assert(wcd.count() > 0)
    assert(wcd.select("ZONE").distinct().count() >= 2)
    // Reek grid: geometry only (no INIT/UNRST shipped) + ZONE merge
    val reekGrid = PathModules("grid")(spark, s"$ReekModel.DATA")
    assert(reekGrid.count() == 35817 && reekGrid.columns.contains("ZONE"))
  }

  test("every reference test deck parses and drives the schedule clock") {
    val decks = {
      val out = Seq.newBuilder[java.nio.file.Path]
      java.nio.file.Files.walk(java.nio.file.Paths.get("/root/reference/tests/data"))
        .filter(p => p.toString.endsWith(".DATA")).forEach(p => out += p)
      out.result()
    }
    assert(decks.size >= 7)
    decks.foreach { p =>
      val events = graft.io.DeckParser.parseFile(p.toString)
      assert(events.nonEmpty, s"$p produced no events")
      // the schedule clock runs over every deck without error; decks
      // with DATES/TSTEP produce at least one dated keyword
      val df = spark.createDataFrame(events)
      val dates = graft.modules.Schedule.keywordDates(df)
      val dated = dates.filter(col("DATE").isNotNull).count()
      val hasClock = events.exists(e => Set("DATES", "START", "TSTEP")(e.keyword))
      if (hasClock) assert(dated > 0, s"$p: clock keywords but no dated rows")
    }
  }

  test("record-level modules fail fast on a multi-deck frame") {
    val events = spark.read.format("eclipse-deck")
      .load(s"$EightCells.DATA,$ReekModel.DATA")
    // the two decks keep distinct full-path ids — no basename collision
    assert(events.select("deckId").distinct().count() == 2)
    val e = intercept[IllegalArgumentException] {
      graft.modules.Compdat.fromEvents(events).count()
    }
    assert(e.getMessage.contains("one deck per call"))
  }

  test("Reek RFT: per-connection report for OP_1") {
    val con = EclBinary.rft(spark, s"$ReekModel.RFT")
    val wells = con.select("WELL").distinct().as[String].collect().toSet
    assert(wells.contains("OP_1") && wells.size == 8, s"wells: $wells")
    val first = con.filter(col("DATE") === lit("2000-02-01") && col("WELL") === "OP_1")
    assert(first.count() == 14) // 14 connections in OP_1's report
    assert(first.filter(col("PRESSURE") <= 0).count() == 0)
    // connection coordinates stay within the grid dims
    assert(first.filter(col("CONIPOS") > 40 || col("CONJPOS") > 64 ||
      col("CONKPOS") > 14).count() == 0)
  }
}
