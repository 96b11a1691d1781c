package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.core.Ops

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic property sampling (scalacheck Gen without the
    * scalatestplus bridge, which isn't on the offline classpath).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("globToRegex matches fnmatch semantics") {
    samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 50).foreach { s =>
      assert(s.matches(Ops.globToRegex("*")))
      assert(s.matches(Ops.globToRegex(s)))
    }
    assert("FOPT".matches(Ops.globToRegex("FOP?")))
    assert(!"FOPTH".matches(Ops.globToRegex("FOP?")))
    assert("WOPR:OP_1".matches(Ops.globToRegex("WOPR:*")))
    assert(!"WOPR:OP_1".matches(Ops.globToRegex("WGPR:*")))
    assert(!"AXB".matches(Ops.globToRegex("A.B"))) // dot is literal
    // fnmatch [seq] character classes (fnmatch.translate semantics)
    assert("PERMX".matches(Ops.globToRegex("PERM[XY]")))
    assert("PERMY".matches(Ops.globToRegex("PERM[XY]")))
    assert(!"PERMZ".matches(Ops.globToRegex("PERM[XY]")))
    assert("PERMZ".matches(Ops.globToRegex("PERM[!XY]")))   // [!seq] negates
    assert(!"PERMX".matches(Ops.globToRegex("PERM[!XY]")))
    assert("TRANX".matches(Ops.globToRegex("TRAN[X-Z]")))   // ranges
    assert("A]B".matches(Ops.globToRegex("A[]]B")))         // leading ] literal
    assert("A[B".matches(Ops.globToRegex("A[B")))           // unterminated [ literal
    assert("A[B".matches(Ops.globToRegex("A[[]B")))         // [ inside class (Java nests)
    assert("AaB".matches(Ops.globToRegex("A[a&b]B")))       // & in class is literal
    assert("A&B".matches(Ops.globToRegex("A[a&&b]B")))      // no Java intersection
  }

  test("well template matching: reference cases incl. leading-wildcard escape rule") {
    // reference test_common.py::test_well_matching_template
    import graft.core.Ops.wellsMatchingTemplate
    assert(wellsMatchingTemplate("OP*", Seq("OP1", "OP2", "WI")) == Seq("OP1", "OP2"))
    assert(wellsMatchingTemplate("B*H", Seq("B_1H", "BH", "B_23H", "WI")) ==
      Seq("B_1H", "BH", "B_23H"))
    assert(wellsMatchingTemplate("B_1H*", Seq("B_1H", "B_1HT2", "OB_1H")) ==
      Seq("B_1H", "B_1HT2"))
    assert(wellsMatchingTemplate("\\*P1", Seq("OP1", "WI")) == Seq("OP1"))
    assert(wellsMatchingTemplate("B_?H", Seq("B_1H", "B_12H")) == Seq("B_1H"))
    assert(wellsMatchingTemplate("\\????", Seq("B_1H", "D_2H", "OP1")) ==
      Seq("B_1H", "D_2H"))
    intercept[IllegalArgumentException](wellsMatchingTemplate("*P1", Seq("OP1")))
    intercept[IllegalArgumentException](wellsMatchingTemplate("????", Seq("B_1H")))
  }

  test("unrollRange emits k2-k1+1 rows per input row") {
    samples(Gen.listOfN(5, Gen.chooseNum(1, 20)), 3).foreach { starts =>
      val df = starts.zipWithIndex
        .map { case (k1, i) => (i.toLong, k1.toLong, (k1 + i).toLong) }
        .toDF("id", "k1", "k2")
      val n = Ops.unrollRange(df, "k1", "k2", "k").count()
      assert(n == starts.zipWithIndex.map { case (_, i) => i + 1 }.sum)
    }
  }

  test("interpolateByIndex fills interior nulls linearly, leaves edges null") {
    val df = Seq(
      (1, 1L, Some(10.0)), (1, 2L, None), (1, 3L, None), (1, 5L, Some(50.0)),
      (1, 6L, None), // trailing null stays null
      (2, 1L, None), (2, 2L, Some(5.0)) // leading null stays null
    ).toDF("g", "x", "v")
    val out = Ops.interpolateByIndex(df, "v", "x", Seq("g"))
      .orderBy("g", "x").collect()
    def v(i: Int): Option[Double] =
      if (out(i).isNullAt(out(i).fieldIndex("v"))) None
      else Some(out(i).getDouble(out(i).fieldIndex("v")))
    assert(v(0).contains(10.0))
    assert(v(1).contains(20.0)) // x=2 between (1,10) and (5,50)
    assert(v(2).contains(30.0)) // x=3
    assert(v(3).contains(50.0))
    assert(v(4).isEmpty) // trailing
    assert(v(5).isEmpty) // leading
    assert(v(6).contains(5.0))
  }

  test("runLengths groups consecutive equal values") {
    val df = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "A"), (5L, "A"), (6L, "A"))
      .toDF("i", "v")
    val runs = Ops.runLengths(df, col("v"), Seq(col("i")))
      .groupBy("run_id").agg(min("v").as("v"), count(lit(1)).as("len"))
      .orderBy("run_id").collect()
    assert(runs.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("A", 2L), ("B", 1L), ("A", 3L)))
  }

  test("sessionize splits on gaps above the threshold") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")), (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val s = Ops.sessionize(df, Seq("user_id"), "ts", 1800)
      .orderBy("user_id", "ts").collect()
    assert(s.map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("lastWinsDedup keeps the row with the highest ordering key") {
    val df = Seq(("w", 1, "OPEN"), ("w", 2, "SHUT"), ("x", 1, "OPEN"))
      .toDF("well", "idx", "st")
    val out = Ops.lastWinsDedup(df, Seq("well"), Seq(col("idx")))
      .orderBy("well").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("SHUT", "OPEN"))
  }

  test("dateDimension monthly covers [trunc(start), trunc(end)+1month]") {
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-15 10:00:00"),
      java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))).toDF("mn", "mx")
    val months = Ops.dateDimension(df, "mn", "mx", "monthly")
      .orderBy("DATE").collect().map(_.getTimestamp(0).toString)
    assert(months.head == "2024-01-01 00:00:00.0")
    assert(months.last == "2024-04-01 00:00:00.0")
    assert(months.length == 4)
  }

  test("stackOnColnames: COL@date wide form stacks to long (common.py example)") {
    val wide = Seq((100.0, 1000.0, 990.0))
      .toDF("PORV", "OWC@2000-01-01", "OWC@2020-01-01")
    val out = Ops.stackOnColnames(wide).orderBy("DATE").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Double]("PORV")).toSeq == Seq(100.0, 100.0))
    assert(out.map(_.getAs[Double]("OWC")).toSeq == Seq(1000.0, 990.0))
    assert(out.map(_.getAs[java.sql.Timestamp]("DATE").toString).toSeq ==
      Seq("2000-01-01 00:00:00.0", "2020-01-01 00:00:00.0"))
    // ragged dates: a vector missing at one date stacks as null
    val ragged = Seq((1.0, 2.0, 3.0))
      .toDF("SWAT@2000-01-01", "SWAT@2020-01-01", "SGAS@2020-01-01")
    val r = Ops.stackOnColnames(ragged).orderBy("DATE").collect()
    assert(r.length == 2)
    assert(r(0).isNullAt(r(0).fieldIndex("SGAS")) && r(1).getAs[Double]("SGAS") == 3.0)
    // frames with no suffixed columns pass through untouched
    val plain = Seq((1, 2)).toDF("A", "B")
    assert(Ops.stackOnColnames(plain).columns.toSeq == Seq("A", "B"))
  }
}
