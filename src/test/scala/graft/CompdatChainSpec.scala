package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.modules.Compdat

class CompdatChainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("chained WELOPENs: each acts on the state as of its own position") {
    val df = Compdat.df(spark,
      """DATES
        | 1 'JAN' 2000 /
        |/
        |COMPDAT
        | 'OP1' 1 1 1 2 'OPEN' /
        |/
        |DATES
        | 1 'FEB' 2000 /
        |/
        |WELOPEN
        | 'OP1' 'SHUT' /
        |/
        |DATES
        | 1 'MAR' 2000 /
        |/
        |WELOPEN
        | 'OP1' 'OPEN' 1 1 2 /
        |/
        |""".stripMargin)
    def states(d: String) = df.filter(s"DATE = timestamp'$d 00:00:00'")
      .collect().map(r => r.getAs[Int]("K1") -> r.getAs[String]("OP/SH")).toMap
    assert(states("2000-01-01") == Map(1 -> "OPEN", 2 -> "OPEN"))
    assert(states("2000-02-01") == Map(1 -> "SHUT", 2 -> "SHUT"))
    assert(states("2000-03-01") == Map(2 -> "OPEN")) // only the re-opened conn re-stated
  }

  test("partially-defaulted WELOPEN coords expand against matching connections") {
    val df = Compdat.df(spark,
      """COMPDAT
        | 'OP1' 1 1 1 1 'OPEN' /
        | 'OP1' 1 2 1 1 'OPEN' /
        | 'OP1' 1 1 2 2 'OPEN' /
        |/
        |WELOPEN
        | 'OP1' 'SHUT' 1 1 /
        |/
        |""".stripMargin)
    // I=1 J=1 given, K defaulted: both K layers of (1,1) shut; (1,2) untouched
    val m = df.collect().map(r =>
      ((r.getAs[Int]("I"), r.getAs[Int]("J"), r.getAs[Int]("K1")), r.getAs[String]("OP/SH"))).toMap
    assert(m(((1, 1, 1))) == "SHUT")
    assert(m(((1, 1, 2))) == "SHUT")
    assert(m(((1, 2, 1))) == "OPEN")
  }

  test("same pipeline runs from a deck file through the DSv2 source") {
    val f = Files.createTempFile("chain", ".DATA")
    Files.writeString(f,
      """COMPDAT
        | 'OP1' 1 1 1 1 'OPEN' /
        |/
        |WELOPEN
        | 'OP1' 'SHUT' /
        |/
        |""".stripMargin)
    val df = Compdat.dfFromPath(spark, f.toString)
    assert(df.count() == 1)
    assert(df.collect().head.getAs[String]("OP/SH") == "SHUT")
  }
}
