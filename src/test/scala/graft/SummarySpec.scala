package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.modules.Summary

class SummarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ts = (s: String) => Timestamp.valueOf(s)

  private lazy val long = Seq(
    ("FOPT", ts("2000-01-15 00:00:00"), 100.0),
    ("FOPT", ts("2000-03-15 00:00:00"), 400.0),
    ("FOPR", ts("2000-01-15 00:00:00"), 10.0),
    ("FOPR", ts("2000-03-15 00:00:00"), 30.0)
  ).toDF("VECTOR", "DATE", "VALUE")

  test("resample monthly: linear interpolation between samples, clamped outside") {
    val out = Summary.resample(long, "monthly")
      .filter("VECTOR = 'FOPT'").orderBy("DATE").collect()
    val byDate = out.map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(byDate("2000-01-01 00:00:00.0") == 100.0) // before first sample → clamp
    // 2000-02-01 is 17 of 60 days between samples: 100 + 300*17/60 = 185
    assert(math.abs(byDate("2000-02-01 00:00:00.0") - 185.0) < 1e-9)
    assert(byDate("2000-04-01 00:00:00.0") == 400.0) // after last → clamp
  }

  test("resample step semantics hold the previous sample (rate vectors)") {
    val out = Summary.resample(long, "monthly", step = true)
      .filter("VECTOR = 'FOPR'").orderBy("DATE").collect()
    val byDate = out.map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(byDate("2000-02-01 00:00:00.0") == 10.0) // held, not interpolated
    assert(byDate("2000-04-01 00:00:00.0") == 30.0)
  }

  test("toWide pivots vectors into columns") {
    val wide = Summary.toWide(Summary.resample(long, "monthly"), Seq("FOPT", "FOPR"))
    assert(wide.columns.toSeq == Seq("DATE", "FOPT", "FOPR"))
    assert(wide.count() == 4)
  }
}
