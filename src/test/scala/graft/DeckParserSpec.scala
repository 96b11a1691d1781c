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

  test("unknown keywords parse under their own name without corrupting neighbors") {
    // the reference's PARSE_UNKNOWN_KEYWORD ignore recovery
    // (resdatafiles.py:20-32): FOOBARBZ is not in the registry
    val events = DeckParser.parse(
      """COMPDAT
        | 'OP1' 1 1 1 1 'OPEN' /
        |/
        |FOOBARBZ
        | 1 2 3 /
        |/
        |WELOPEN
        | 'OP1' 'SHUT' /
        |/
        |""".stripMargin)
    assert(events.filter(_.keyword == "COMPDAT").flatMap(_.items) ==
      Vector("OP1", "1", "1", "1", "1", "OPEN"))
    assert(events.filter(_.keyword == "FOOBARBZ").head.items == Vector("1", "2", "3"))
    assert(events.filter(_.keyword == "WELOPEN").flatMap(_.items) ==
      Vector("OP1", "SHUT"))
  }

  test("TITLE consumes exactly one free-text line") {
    val events = DeckParser.parse(
      """RUNSPEC
        |TITLE
        | My Reservoir Model 2000
        |DIMENS
        | 2 2 2 /
        |""".stripMargin)
    assert(events.filter(_.keyword == "TITLE").head.items ==
      Vector("My", "Reservoir", "Model", "2000"))
    assert(events.filter(_.keyword == "DIMENS").head.items == Vector("2", "2", "2"))
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

  test("one-word all-caps TITLE is the title, not an unknown keyword") {
    val events = DeckParser.parse(
      """RUNSPEC
        |TITLE
        |REEK
        |DIMENS
        | 2 2 2 /
        |""".stripMargin)
    val title = events.filter(_.keyword == "TITLE")
    assert(title.length == 1 && title.head.items == Vector("REEK"))
    assert(events.filter(_.keyword == "DIMENS").head.items == Vector("2", "2", "2"))
    assert(!events.exists(_.keyword == "REEK"))
  }

  test("TITLE text starting with a registry word stays the title") {
    val events = DeckParser.parse(
      """TITLE
        |FIELD MODEL A
        |DIMENS
        | 1 1 1 /
        |""".stripMargin)
    assert(events.filter(_.keyword == "TITLE").head.items ==
      Vector("FIELD", "MODEL", "A"))
    assert(!events.exists(e => e.keyword == "FIELD"))
  }

  test("record whose first line is a lone well name is not swallowed as a keyword") {
    // a multi-line WELSPECS record opening with just the well name
    val events = DeckParser.parse(
      """WELSPECS
        | 'OP1' 'G' 5 6 1000 'OIL' /
        | OP_2
        |   'G' 7 8 1100 'OIL' /
        |/
        |""".stripMargin)
    val recs = events.filter(e => e.keyword == "WELSPECS" && e.items.nonEmpty)
    assert(recs.length == 2)
    assert(recs(1).items == Vector("OP_2", "G", "7", "8", "1100", "OIL"))
    assert(!events.exists(_.keyword == "OP_2"))
  }

  test("TITLE text on the keyword line itself does not poison the parse") {
    val events = DeckParser.parse(
      "TITLE Some Model\nDIMENS\n 2 2 2 /\n")
    assert(events.filter(_.keyword == "TITLE").head.items == Vector("Some", "Model"))
    assert(events.filter(_.keyword == "DIMENS").head.items == Vector("2", "2", "2"))
  }

  test("blank line after TITLE is an empty title; the next keyword survives") {
    val events = DeckParser.parse(
      "TITLE\n\nDIMENS\n 2 2 2 /\n")
    assert(events.filter(_.keyword == "TITLE").head.items.isEmpty)
    assert(events.filter(_.keyword == "DIMENS").head.items == Vector("2", "2", "2"))
    // comment lines may still precede the title text
    val events2 = DeckParser.parse(
      "TITLE\n-- a comment\nReal Title\nDIMENS\n 1 1 1 /\n")
    assert(events2.filter(_.keyword == "TITLE").head.items == Vector("Real", "Title"))
  }

  test("unknown keyword whose record opens with a lone token still parses") {
    val events = DeckParser.parse(
      """GRUPTREE
        | 'G1' 'FIELD' /
        |/
        |SOMEKW
        |VAL1
        |/
        |""".stripMargin)
    // SOMEKW must become its own keyword, not a phantom GRUPTREE record
    assert(events.count(e => e.keyword == "GRUPTREE" && e.items.nonEmpty) == 1)
    assert(events.exists(e => e.keyword == "SOMEKW" && e.items == Vector("VAL1")))
  }

  test("lone trailing token at EOF is stray data, not a keyword") {
    val events = DeckParser.parse(
      """COMPDAT
        | 'OP1' 1 1 1 1 'OPEN' /
        |/
        |GARBAGE
        |""".stripMargin)
    assert(!events.exists(_.keyword == "GARBAGE"))
  }
}
