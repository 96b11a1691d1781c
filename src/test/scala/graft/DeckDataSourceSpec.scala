package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class DeckDataSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val deckFile = {
    val f = Files.createTempFile("deck", ".DATA")
    Files.writeString(f,
      """WELSPECS
        | 'OP1' 'G' 5 6 1000 'OIL' /
        |/
        |DATES
        | 1 'JAN' 2000 /
        |/
        |COMPDAT
        | 'OP1' 2* 1 2 'OPEN' /
        |/
        |""".stripMargin)
    f.toString
  }

  test("eclipse-deck DSv2 format reads the event stream") {
    val df = spark.read.format("eclipse-deck").load(deckFile)
    assert(df.columns.toSeq == Seq("keywordIdx", "keyword", "recordIdx", "items", "deckId"))
    assert(df.count() == 6) // 2 records/kw for WELSPECS+DATES (incl. terminators) + 2 COMPDAT
    val compdat = df.filter("keyword = 'COMPDAT' AND size(items) > 0").collect()
    assert(compdat.length == 1)
    assert(compdat.head.getSeq[String](3).take(3) == Seq("OP1", "1*", "1*"))
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("eclipse-deck").load(deckFile).select("keyword")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("keyword") && !scanLine.contains("items"))
    assert(df.distinct().count() == 3)
  }

  test("the parsed stream drives the schedule clock like the in-memory path") {
    val events = spark.read.format("eclipse-deck").load(deckFile)
    val dates = graft.modules.Schedule.keywordDates(events)
      .orderBy("keywordIdx").collect()
    assert(dates(2).getTimestamp(1).toString == "2000-01-01 00:00:00.0")
  }
}
