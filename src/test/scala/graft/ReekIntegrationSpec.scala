package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.DeckParser
import graft.modules._

/** End-to-end over the reference's REAL full-field deck (Reek, 40×64×14,
  * 16 INCLUDE files) — the graft analog of the reference's
  * tests/test_userapi.py: parse the production .DATA with INCLUDE
  * resolution and run every deck-derived module on the resulting events.
  */
class ReekIntegrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Deck =
    "/root/reference/tests/data/reek/eclipse/model/2_R001_REEK-0.DATA"

  private lazy val deckText = DeckParser.expandIncludes(
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(Deck))),
    java.nio.file.Paths.get(Deck).getParent)

  private lazy val events = {
    assume(new java.io.File(Deck).exists(), "reference Reek deck not present")
    spark.createDataFrame(DeckParser.parseFile(Deck))
  }

  test("full Reek deck parses with INCLUDEs resolved") {
    assert(events.count() > 500)
    val kws = events.select("keyword").distinct().collect().map(_.getString(0)).toSet
    assert(Set("COMPDAT", "WELSPECS", "GRUPTREE", "EQUIL", "SWOF", "FAULTS",
      "DATES", "WCONHIST").subsetOf(kws), s"missing from: $kws")
  }

  test("compdat pipeline over the real schedule") {
    val df = Compdat.fromEvents(events)
    assert(df.count() > 100)
    assert(df.select("WELL").distinct().count() >= 5)
    // every connection has resolved coordinates and a status
    assert(df.filter(col("I").isNull || col("K1").isNull).count() == 0)
    assert(df.filter(!col("OP/SH").isin("OPEN", "SHUT")).count() == 0)
    // dates come from the schedule clock
    assert(df.filter(col("DATE").isNotNull).count() > 0)
  }

  test("gruptree snapshots and tree render over the real deck") {
    val df = Gruptree.df(spark, deckText)
    assert(df.count() > 0)
    val lastDate = df.agg(max("DATE")).head.get(0)
    val text = TreePrint.render(df.filter(col("DATE") === lit(lastDate)))
    assert(text.contains("FIELD"))
  }

  test("zones.lyr discovered next to the deck and parsed") {
    val found = GridOps.findZonemapFile(Deck)
    assert(found.isDefined)
    val zonemap = GridOps.parseLyr(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(found.get))))
    assert(zonemap(1) == "UpperReek" && zonemap(5) == "UpperReek")
    assert(zonemap(6) == "MidReek" && zonemap(14) == "LowerReek")
    assert(zonemap(15) == "Aquifer Way Down") // quoted name with spaces
    assert(zonemap.size == 15)
  }

  test("satfunc, equil, wcon and faults modules find their keywords") {
    assert(Satfunc.df(spark, deckText).count() > 10)
    val eq = Equil.equil(events, Equil.phasesFromEvents(events))
    assert(eq.count() >= 1 && eq.columns.contains("OWC") && eq.columns.contains("GOC"))
    assert(Wcon.df(spark, deckText).count() > 10)
    assert(Faults.df(spark, deckText).count() > 10)
  }
}
