package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.DeckParser

class DeckParserSpec extends AnyFunSuite {

  test("tokenize: comments, quotes, repeats") {
    assert(DeckParser.tokenizeLine("  'OP 1' 33 44 -- trailing") == Vector("OP 1", "33", "44"))
    assert(DeckParser.tokenizeLine("-- full comment") == Vector())
    assert(DeckParser.tokenizeLine("1 'JAN' 2000 /") == Vector("1", "JAN", "2000", "/"))
  }

  test("records terminate on slash; repeats and defaults expand") {
    val events = DeckParser.parse(
      """COMPDAT
        | 'OP1' 33 44 10 11 'OPEN' 2* 0.5 /
        | 'OP2' 2* 10 11 /
        |/
        |""".stripMargin)
    assert(events.map(_.keyword).distinct == Vector("COMPDAT"))
    assert(events(0).items == Vector("OP1", "33", "44", "10", "11", "OPEN", "1*", "1*", "0.5"))
    assert(events(1).items == Vector("OP2", "1*", "1*", "10", "11"))
    assert(events(2).items.isEmpty) // terminator record
  }

  test("multi-keyword deck keeps global keyword ordinals") {
    val events = DeckParser.parse(
      """WELSPECS
        | 'OP1' 'G' 5 6 1000 'OIL' /
        |/
        |DATES
        | 1 'JAN' 2000 /
        |/
        |COMPDAT
        | 'OP1' 2* 1 1 /
        |/
        |""".stripMargin)
    assert(events.map(_.keyword).distinct == Vector("WELSPECS", "DATES", "COMPDAT"))
    val kwIdx = events.groupBy(_.keyword).view.mapValues(_.head.keywordIdx).toMap
    assert(kwIdx("WELSPECS") < kwIdx("DATES") && kwIdx("DATES") < kwIdx("COMPDAT"))
  }

  test("quoted first token is data, not a keyword (a group named FIELD)") {
    val events = DeckParser.parse(
      """GRUPTREE
        | 'G1' 'FIELD' /
        | 'FIELD' 'NORTH' /
        |/
        |""".stripMargin)
    assert(events.count(_.keyword == "GRUPTREE") == 3)
    assert(events(1).items == Vector("FIELD", "NORTH"))
  }

  test("record data spanning multiple lines") {
    val events = DeckParser.parse(
      """SWOF
        | 0.1 0.0
        | 1.0 0.0
        | 1.0 1.0 0.0 0.0 /
        |/
        |""".stripMargin)
    assert(events(0).items.length == 8)
  }
}
