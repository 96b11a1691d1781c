package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.modules.{Compdat, Schedule}
import graft.io.DeckParser

class WlistComplumpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def stateMap(df: org.apache.spark.sql.DataFrame): Map[(String, Int), String] =
    df.collect().map(r => (
      (r.getAs[String]("WELL"), r.getAs[Int]("K1")), r.getAs[String]("OP/SH"))).toMap

  test("WLIST NEW list resolves in WELOPEN") {
    val df = Compdat.df(spark,
      """COMPDAT
        | 'OP1' 1 1 1 1 'OPEN' /
        | 'OP2' 2 2 2 2 'OPEN' /
        | 'WI1' 3 3 3 3 'OPEN' /
        |/
        |WLIST
        | '*PROD' 'NEW' 'OP1' 'OP2' /
        |/
        |WELOPEN
        | '*PROD' 'SHUT' /
        |/
        |""".stripMargin)
    val m = stateMap(df)
    assert(m(("OP1", 1)) == "SHUT" && m(("OP2", 2)) == "SHUT" && m(("WI1", 3)) == "OPEN")
  }

  test("WLIST fold: ADD extends, DEL removes, MOV moves between lists") {
    val events = DeckParser.toDS(spark,
      """WLIST
        | '*A' 'NEW' 'W1' 'W2' /
        | '*B' 'NEW' 'W3' /
        | '*A' 'ADD' 'W4' /
        | '*A' 'DEL' 'W1' /
        | '*B' 'MOV' 'W2' /
        |/
        |""".stripMargin).toDF()
    val snaps = Compdat.expandWlist(Compdat.wlistRecords(events))
      .orderBy("recordIdx").collect()
    assert(snaps(0).getSeq[String](3) == Seq("W1", "W2"))
    assert(snaps(2).getSeq[String](3) == Seq("W1", "W2", "W4")) // ADD
    assert(snaps(3).getSeq[String](3) == Seq("W2", "W4"))       // DEL W1
    assert(snaps(4).getSeq[String](3) == Seq("W2", "W3"))       // MOV W2 into B
  }

  test("WLIST list reference inside a NEW resolves against current state") {
    val events = DeckParser.toDS(spark,
      """WLIST
        | '*A' 'NEW' 'W1' 'W2' /
        | '*C' 'NEW' '*A' 'W9' /
        |/
        |""".stripMargin).toDF()
    val snaps = Compdat.expandWlist(Compdat.wlistRecords(events))
      .orderBy("recordIdx").collect()
    assert(snaps(1).getSeq[String](3) == Seq("W1", "W2", "W9"))
  }

  test("COMPLUMP range in WELOPEN expands to lumped connections only") {
    val df = Compdat.df(spark,
      """COMPDAT
        | 'OP1' 1 1 1 4 'OPEN' /
        |/
        |COMPLUMP
        | 'OP1' 1 1 1 2 7 /
        | 'OP1' 1 1 3 4 8 /
        |/
        |WELOPEN
        | 'OP1' 'SHUT' 3* 7 7 /
        |/
        |""".stripMargin)
    val m = stateMap(df)
    assert(m(("OP1", 1)) == "SHUT" && m(("OP1", 2)) == "SHUT") // lump 7
    assert(m(("OP1", 3)) == "OPEN" && m(("OP1", 4)) == "OPEN") // lump 8 untouched
  }
}
