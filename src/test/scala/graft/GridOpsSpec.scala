package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.modules.GridOps

class GridOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2x2x2 synthetic grid: ACTIVE_IDX, I, J, K, X, Y, Z, VOLUME
  private lazy val geometry = Seq(
    (0L, 1, 1, 1, 100.0, 100.0, 2000.0, 10.0), (1L, 2, 1, 1, 200.0, 100.0, 2000.0, 10.0),
    (2L, 1, 2, 1, 100.0, 200.0, 2000.0, 10.0), (3L, 2, 2, 1, 200.0, 200.0, 2000.0, 10.0),
    (4L, 1, 1, 2, 100.0, 100.0, 2010.0, 12.0), (5L, 2, 1, 2, 200.0, 100.0, 2010.0, 12.0),
    (6L, 1, 2, 2, 100.0, 200.0, 2010.0, 12.0), (7L, 2, 2, 2, 200.0, 200.0, 2010.0, 12.0)
  ).toDF("ACTIVE_IDX", "I", "J", "K", "X", "Y", "Z", "VOLUME")

  test("assemble: geometry + init + restart outer-join on the active ordinal; SOIL derived") {
    val init = Seq((0L, 0.25, -1.0e20), (1L, 0.30, 5.0))
      .toDF("ACTIVE_IDX", "PORO", "PERMX")
    val rst = Seq((0L, 0.6, 0.1), (1L, 0.5, 0.2)).toDF("ACTIVE_IDX", "SWAT", "SGAS")
    val df = GridOps.assemble(geometry,
      Some(GridOps.washNanSentinel(init, Seq("PERMX"))), Some(rst))
    assert(df.count() == 8)
    val r0 = df.filter("ACTIVE_IDX = 0").collect().head
    assert(math.abs(r0.getAs[Double]("SOIL") - 0.3) < 1e-12)
    assert(r0.isNullAt(r0.fieldIndex("PERMX"))) // sentinel washed to null
    assert(df.filter("ACTIVE_IDX = 7").collect().head.isNullAt(
      df.columns.indexOf("PORO"))) // outer join pads missing init
    // a restart CARRYING SOIL wins over the derivation (grid.py guard)
    val rstWithSoil = Seq((0L, 0.6, 0.1, 0.42)).toDF("ACTIVE_IDX", "SWAT", "SGAS", "SOIL")
    val carried = GridOps.assemble(geometry, None, Some(rstWithSoil))
      .filter("ACTIVE_IDX = 0").collect().head
    assert(carried.getAs[Double]("SOIL") == 0.42)
    // and the CLI's vectors gate: derivation only when a glob asks for SOIL
    val gated = GridOps.assemble(geometry, None, Some(rst),
      deriveSoil = GridOps.vectorsMatchSoil(Seq("SWAT", "SGAS")))
    assert(!gated.columns.contains("SOIL"))
    assert(GridOps.vectorsMatchSoil(Nil) && GridOps.vectorsMatchSoil(Seq("SO*")))
    assert(!GridOps.vectorsMatchSoil(Seq("PRESSURE")))
  }

  test("mergeZones + parseLyr: K layer to zone name") {
    val zonemap = GridOps.parseLyr(
      """-- zone file
        |'Upper' 1
        |'Lower' 2
        |""".stripMargin)
    assert(zonemap == Map(1 -> "Upper", 2 -> "Lower"))
    val df = GridOps.mergeZones(geometry, zonemap)
    assert(df.filter("K = 1").select("ZONE").distinct().collect().head.getString(0) == "Upper")
  }

  test("parseLyr handles K ranges") {
    assert(GridOps.parseLyr("'A' 1-3\n'B' 4") ==
      Map(1 -> "A", 2 -> "A", 3 -> "A", 4 -> "B"))
  }

  test("pillarStats: sums volumes, averages coordinates per I-J pillar") {
    val stats = GridOps.pillarStats(geometry)
    assert(stats.count() == 4)
    val p11 = stats.filter("PILLAR = '1-1'").collect().head
    assert(p11.getAs[Double]("VOLUME") == 22.0)
    assert(p11.getAs[Double]("Z") == 2005.0)
  }

  test("contactDepth: deepest cell above saturation cutoff") {
    val withSat = geometry.withColumn("SWAT",
      when(col("K") === 2, 0.8).otherwise(0.2))
    val owc = GridOps.contactDepth(withSat, "SWAT", 0.5, "OWC")
    assert(owc.count() == 4)
    assert(owc.collect().forall(_.getAs[Double]("OWC") == 2010.0))
  }

  test("transRegionInterface: boundary filter + canonical pair rollup") {
    val trans = Seq(
      (1, 2, 5.0), (2, 1, 7.0), (1, 1, 99.0), (2, 3, 1.5)
    ).toDF("FIPNUM1", "FIPNUM2", "TRAN")
    val out = GridOps.transRegionInterface(trans, "FIPNUM").orderBy("PAIR").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("PAIR") == "1-2" && out(0).getAs[Double]("TRAN") == 12.0)
    assert(out(1).getAs[String]("PAIR") == "2-3" && out(1).getAs[Double]("TRAN") == 1.5)
  }

  test("nnc: vertical filter and coordinate join") {
    val nnc = Seq(
      (1, 1, 1, 1, 1, 2, 0.5),  // vertical (same I,J)
      (1, 1, 1, 2, 1, 1, 0.3)   // horizontal
    ).toDF("I1", "J1", "K1", "I2", "J2", "K2", "TRAN")
    assert(GridOps.filterVerticalNnc(nnc).count() == 1)
    val coords = GridOps.nncWithCoordinates(nnc, geometry)
    val v = coords.filter("K2 = 2").collect().head
    assert(v.getAs[Double]("Z") == 2005.0) // midpoint of 2000 and 2010
  }

  test("mergeInitVectors + mergeParams") {
    val compdatLike = Seq(("OP1", 1, 1, 1)).toDF("WELL", "I", "J", "K1")
    val init = Seq((1, 1, 1, 0.25)).toDF("GI", "GJ", "GK", "PORO")
    val merged = GridOps.mergeInitVectors(compdatLike, init,
      Seq("I" -> "GI", "J" -> "GJ", "K1" -> "GK"))
    assert(merged.collect().head.getAs[Double]("PORO") == 0.25)
    val p = GridOps.mergeParams(merged, Map("CASE" -> "demo"))
    assert(p.columns.contains("CASE"))
  }

  test("parameter file discovery walks up the directory convention") {
    val root = java.nio.file.Files.createTempDirectory("graft-params")
    val model = root.resolve("eclipse").resolve("model")
    java.nio.file.Files.createDirectories(model)
    java.nio.file.Files.writeString(root.resolve("parameters.txt"),
      "# a comment\nFWL 1700.5\nRMS_SEED 422789\nBADLINE 1 2 3\n")
    java.nio.file.Files.writeString(model.resolve("parameters.json"), "{}")
    val found = GridOps.findParameterFiles(model.resolve("CASE.DATA").toString)
    assert(found.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("parameters.json", "parameters.txt")) // same-dir json first, then 2-up txt
    val params = GridOps.parseParametersTxt(
      java.nio.file.Files.readString(root.resolve("parameters.txt")))
    assert(params == Map("FWL" -> "1700.5", "RMS_SEED" -> "422789"))
  }

  test("lyr records: ranges, spans, color validation, reference failure modes") {
    import GridOps.LyrZone
    val ok = GridOps.parseLyrRecords(
      """-- comment
        |'ZoneA' 1-4     #FFE5F7
        |'ZoneB' 5       red
        |'ZoneC' 6 - 8
        |""".stripMargin)
    assert(ok.contains(Seq(
      LyrZone("ZoneA", Some(1), Some(4), None, Some("#FFE5F7")),
      LyrZone("ZoneB", None, None, Some(5), Some("red")),
      LyrZone("ZoneC", Some(6), Some(8), None, None))))
    // invalid color token is NOT a color → it poisons the number parse
    assert(GridOps.parseLyrRecords("'Z' 1-2 notacolor\n").isEmpty)
    // inverted range fails the whole parse, like the reference
    assert(GridOps.parseLyrRecords("'Z' 4-1\n").isEmpty)
    assert(GridOps.isColor("#abc") && GridOps.isColor("DarkSeaGreen"))
    assert(!GridOps.isColor("#abcd") && !GridOps.isColor("zzz"))
  }

  test("parameters parse through the yaml -> json -> txt cascade") {
    // yaml: flat keys survive, grouped (dict-valued) keys are dropped
    // (parameters.py:177-183); numbers render as written
    val yml = GridOps.parseParameters(
      "FWL: 1700.5\nLABEL: hello\ngrouped:\n  inner: 3\n")
    assert(yml == Map("FWL" -> "1700.5", "LABEL" -> "hello"))
    // json object with mixed types; nested object dropped
    val json = GridOps.parseParameters(
      """{"SEED": 42, "NAME": "x y", "sub": {"a": 1}, "FRAC": 0.25}""")
    assert(json == Map("SEED" -> "42", "NAME" -> "x y", "FRAC" -> "0.25"))
    // txt falls through both structured parsers
    assert(GridOps.parseParameters("FWL 1700.5\nRMS_SEED 422789\n") ==
      Map("FWL" -> "1700.5", "RMS_SEED" -> "422789"))
    // empty file → empty map (parameters.py:131-133)
    assert(GridOps.parseParameters("   \n") == Map.empty)
    // discovered files parse by content, whatever the extension
    val d = java.nio.file.Files.createTempDirectory("graft-params2")
    java.nio.file.Files.writeString(d.resolve("parameters.yml"), "A: 1\nB: two\n")
    assert(GridOps.parseParametersFile(d.resolve("parameters.yml").toString) ==
      Map("A" -> "1", "B" -> "two"))
  }

  // 2x2x2 grid with TRAN vectors and a FIPNUM split along I
  // (cells at I=1 are region 1, I=2 are region 2)
  private lazy val tranGrid = Seq(
    (1, 1, 1, 0.5, 0.3, 0.1, 1, 100.0, 100.0, 2000.0),
    (2, 1, 1, 0.0, 0.4, 0.2, 2, 200.0, 100.0, 2000.0),
    (1, 2, 1, 0.6, 0.0, 0.0, 1, 100.0, 200.0, 2000.0),
    (2, 2, 1, 0.0, 0.0, 0.3, 2, 200.0, 200.0, 2000.0),
    (1, 1, 2, 0.7, 0.8, 0.0, 1, 100.0, 100.0, 2010.0),
    (2, 1, 2, 0.0, 0.9, 0.0, 2, 200.0, 100.0, 2010.0),
    (1, 2, 2, 1.0, 0.0, 0.0, 1, 100.0, 200.0, 2010.0),
    (2, 2, 2, 0.0, 0.0, 0.0, 2, 200.0, 200.0, 2010.0)
  ).toDF("I", "J", "K", "TRANX", "TRANY", "TRANZ", "FIPNUM", "X", "Y", "Z")

  test("trans: neighbour pairs per direction from positive TRAN vectors (test_trans)") {
    val out = GridOps.trans(tranGrid).collect()
    // 4 TRANX>0 + 4 TRANY>0 + 3 TRANZ>0
    assert(out.length == 11)
    assert(out.map(_.getAs[String]("DIR")).toSet == Set("I", "J", "K"))
    val iPair = out.filter(r => r.getAs[String]("DIR") == "I" &&
      r.getAs[Int]("I1") == 1 && r.getAs[Int]("J1") == 1 && r.getAs[Int]("K1") == 1).head
    assert((iPair.getAs[Int]("I2"), iPair.getAs[Int]("J2"), iPair.getAs[Int]("K2")) == ((2, 1, 1)))
    assert(iPair.getAs[Double]("TRAN") == 0.5)
    // direction filters
    assert(GridOps.trans(tranGrid, onlyKDir = true).select("DIR").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("K"))
    assert(!GridOps.trans(tranGrid, onlyIJDir = true).collect()
      .exists(_.getAs[String]("DIR") == "K"))
    assert(GridOps.trans(tranGrid, onlyKDir = true, onlyIJDir = true).isEmpty)
    // unknown vectors are skipped with no error; known ones attach both sides
    val v = GridOps.trans(tranGrid, vectors = Seq("FIPNUM", "BOGUS"))
    assert(v.columns.contains("FIPNUM1") && v.columns.contains("FIPNUM2"))
    assert(!v.columns.contains("BOGUS1"))
    // boundary filter: only I-direction pairs cross the FIPNUM split
    val b = GridOps.trans(tranGrid, vectors = Seq("FIPNUM"), boundaryFilter = true)
    assert(b.select("DIR").distinct().collect().map(_.getString(0)).toSeq == Seq("I"))
    assert(b.count() == 4)
  }

  test("trans: NNC concat, coords, and interface grouping (test_grouptrans)") {
    val nnc = Seq((1, 1, 1, 2, 2, 2, 0.05))
      .toDF("I1", "J1", "K1", "I2", "J2", "K2", "TRAN")
    val withNnc = GridOps.trans(tranGrid, nnc = Some(nnc))
    assert(withNnc.count() == 12)
    assert(withNnc.filter(org.apache.spark.sql.functions.col("DIR") === "NNC").count() == 1)

    val c = GridOps.trans(tranGrid, coords = true).collect()
    assert(c.forall(r => !r.isNullAt(r.fieldIndex("X")) && !r.isNullAt(r.fieldIndex("DZ"))))
    val ip = c.filter(r => r.getAs[String]("DIR") == "I").head
    assert(ip.getAs[Double]("X") == 150.0 && ip.getAs[Double]("DX") == 100.0)

    val g = GridOps.trans(tranGrid, vectors = Seq("FIPNUM"), group = true, coords = true)
      .collect()
    // one FIPNUM interface (1-2): TRAN = sum of the 4 boundary-crossing I-pairs
    assert(g.length == 1)
    val row = g.head
    assert(row.getAs[String]("FIPNUMPAIR") == "1-2")
    assert((row.getAs[String]("FIPNUM1"), row.getAs[String]("FIPNUM2")) == (("1", "2")))
    assert(math.abs(row.getAs[Double]("TRAN") - (0.5 + 0.6 + 0.7 + 1.0)) < 1e-12)
    // grouping with two PRESENT vectors is refused (the reference returns
    // empty with a logged error; we fail fast). An absent second vector is
    // presence-filtered first, exactly like the reference.
    assertThrows[IllegalArgumentException](
      GridOps.trans(tranGrid, vectors = Seq("FIPNUM", "X"), group = true))
    assert(GridOps.trans(tranGrid, vectors = Seq("FIPNUM", "EQLNUM"), group = true)
      .count() == 1)
  }
}
