package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.spark.sql.functions.col

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

  test("corpusFromPath: a directory of decks = per-deck single runs, one plan") {
    val dir = Files.createTempDirectory("graft-corpus")
    def deck(i: Int) =
      s"""DATES
         | 1 'JAN' ${2000 + i} /
         |/
         |WELSPECS
         | 'W$i' 'G' 1 2 /
         |/
         |COMPDAT
         | 'W$i' 2* 1 2 'OPEN' /
         |/
         |""".stripMargin
    val texts = (1 to 3).map(i => i -> deck(i)).toMap
    texts.foreach { case (i, t) => Files.writeString(dir.resolve(s"D$i.DATA"), t) }
    val corpus = graft.modules.Compdat.corpusFromPath(spark, dir.toString + "/*.DATA")
    assert(corpus.columns.contains("deckId"))
    assert(corpus.select("deckId").distinct().count() == 3)
    // varargs multi-path load (Spark encodes it as a JSON paths array)
    val two = graft.modules.Compdat.corpusFromPath(spark,
      dir.resolve("D1.DATA").toString, dir.resolve("D2.DATA").toString)
    assert(two.select("deckId").distinct().count() == 2)
    // the fleet pattern: wildcard in a MIDDLE segment
    val reals = Files.createTempDirectory("graft-reals")
    (1 to 2).foreach { i =>
      val sub = reals.resolve(s"r$i"); Files.createDirectories(sub)
      Files.writeString(sub.resolve("deck.DATA"), deck(i))
    }
    val fleet = graft.modules.Compdat.corpusFromPath(spark,
      reals.toString + "/*/deck.DATA")
    assert(fleet.select("deckId").distinct().count() == 2)
    // each deck's slice is byte-equal to its single-deck run
    texts.foreach { case (i, t) =>
      val single = graft.modules.Compdat.df(spark, t)
      val slice = corpus.filter(col("deckId").endsWith(s"D$i.DATA"))
        .drop("deckId")
      assert(slice.exceptAll(single).isEmpty && single.exceptAll(slice).isEmpty,
        s"deck $i corpus slice != single-deck run")
    }
  }
}
