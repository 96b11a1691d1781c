package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.io.DeckParser
import graft.modules.Gruptree

class IncludeGruptreeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("INCLUDE splices nested files with relative path resolution") {
    val dir = Files.createTempDirectory("deck")
    Files.writeString(dir.resolve("sched.inc"),
      """COMPDAT
        | 'OP1' 1 1 1 1 'OPEN' /
        |/
        |""".stripMargin)
    Files.writeString(dir.resolve("main.DATA"),
      """WELSPECS
        | 'OP1' 'G' 1 1 1000 'OIL' /
        |/
        |INCLUDE
        | 'sched.inc' /
        |DATES
        | 1 'JAN' 2000 /
        |/
        |""".stripMargin)
    val events = DeckParser.parseFile(dir.resolve("main.DATA").toString)
    assert(events.map(_.keyword).distinct == Vector("WELSPECS", "COMPDAT", "DATES"))
    // ordinals interleave in splice order
    val kwIdx = events.groupBy(_.keyword).view.mapValues(_.head.keywordIdx).toMap
    assert(kwIdx("WELSPECS") < kwIdx("COMPDAT") && kwIdx("COMPDAT") < kwIdx("DATES"))
  }

  test("gruptree node properties merge onto snapshot rows") {
    val df = Gruptree.df(spark,
      """DATES
        | 1 'JAN' 2000 /
        |/
        |GRUPTREE
        | 'G1' 'FIELD' /
        |/
        |GRUPNET
        | 'G1' 250.0 1 /
        |/
        |""".stripMargin)
    val g1 = df.filter("CHILD = 'G1'").collect().head
    assert(g1.getAs[Double]("TERMINAL_PRESSURE") == 250.0)
    assert(g1.getAs[Int]("VFP_TABLE") == 1)
    val root = df.filter("CHILD = 'FIELD'").collect().head
    assert(root.isNullAt(root.fieldIndex("TERMINAL_PRESSURE")))
  }

  test("ASCII tree render of a snapshot") {
    val df = Gruptree.df(spark,
      """GRUPTREE
        | 'G1' 'FIELD' /
        | 'G2' 'FIELD' /
        | 'G3' 'G1' /
        |/
        |""".stripMargin)
    val text = graft.modules.TreePrint.render(df)
    assert(text.startsWith("FIELD\n"))
    assert(text.contains("├── G1") && text.contains("│   └── G3") && text.contains("└── G2"))
  }

  test("tree render finds roots when dummy root rows are omitted; multi-root sorts") {
    // reference test_gruptree.py::test_multiple_roots (edges_noroots case)
    import spark.implicits._
    val edges = Seq(("PLATB", "FIELDB"), ("PLATA", "FIELDA"))
      .toDF("CHILD", "PARENT")
    val text = graft.modules.TreePrint.render(edges)
    assert(text ==
      "FIELDA\n└── PLATA\nFIELDB\n└── PLATB\n")
  }

  test("renderLines one-group slice equals render, per key") {
    import spark.implicits._
    // two trees in one frame, incl. an omitted-root edge in case b
    val edges = Seq(
      ("a", "G1", Some("FIELD")), ("a", "G2", Some("FIELD")),
      ("a", "G3", Some("G1")), ("a", "FIELD", None),
      ("b", "PLATB", Some("FIELDB")), ("b", "PLATA", Some("FIELDA")))
      .toDF("case_id", "CHILD", "PARENT")
    val lines = graft.modules.TreePrint.renderLines(edges, "case_id")
      .orderBy(org.apache.spark.sql.functions.col("case_id"),
        org.apache.spark.sql.functions.col("line_no")).collect()
    for (k <- Seq("a", "b")) {
      val slice = lines.filter(_.getString(0) == k)
        .map(_.getString(2)).mkString("", "\n", "\n")
      val single = graft.modules.TreePrint.render(
        edges.filter(org.apache.spark.sql.functions.col("case_id") === k))
      assert(slice == single, s"case $k")
    }
    // ordinals are 1-based and dense per key
    assert(lines.filter(_.getString(0) == "a").map(_.getLong(1)).toSeq == (1L to 4L))
  }
}
