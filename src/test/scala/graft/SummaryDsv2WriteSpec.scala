package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `eclipse-unsmry` BATCH_WRITE path: `df.write.format(…).save(dir)`
  * must land one SMSPEC/UNSMRY pair per CASE (the reference's per-case
  * `df2ressum`, summary.py:602-689, as a single distributed write), with
  * Spark inserting the clustering/sort the Write REQUIRES, and the
  * commit protocol leaving no `.inprogress` temporaries behind. The
  * q177 gate hashes the full write→read round trip against the fleet
  * oracle; these tests pin the mechanics.
  */
class SummaryDsv2WriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-sumwrite-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def fleetDf(cases: Int, days: Int, bump: Double = 0.0) = {
    import spark.implicits._
    (for {
      c <- 0 until cases
      (v, vi) <- Seq("FOPR", "WBHP:W0").zipWithIndex
      t <- 0 until days
    } yield (s"CASE$c",
      java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(t)),
      v, 100.0 * vi + t + 7.0 * c + bump))
      .toDF("CASE", "DATE", "VECTOR", "VALUE")
  }

  test("fleet write lands one SMSPEC/UNSMRY pair per case, round-trips exactly") {
    val d = tmpDir("fleet")
    // shuffled input: the required distribution/ordering must regroup it
    fleetDf(3, 5).orderBy(rand(7)).write
      .format("eclipse-unsmry").mode("append").save(d)
    val files = new java.io.File(d).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".SMSPEC")) === 3)
    assert(files.count(_.endsWith(".UNSMRY")) === 3)
    assert(!files.exists(_.contains("inprogress")), files.mkString(","))
    val back = spark.read.format("eclipse-unsmry").load(s"$d/*.UNSMRY")
      .select(col("CASE"), col("DATE"), col("VECTOR"), col("VALUE"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getDate(1).toString,
        r.getString(2), r.getDouble(3))).toSet
    val expected = fleetDf(3, 5).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getString(2), r.getDouble(3))).toSet
    assert(back === expected)
  }

  test("overwrite replaces a case's files; absent cases are untouched") {
    val d = tmpDir("overwrite")
    fleetDf(2, 3).write.format("eclipse-unsmry").mode("append").save(d)
    // rewrite ONLY case 0 with bumped values (overwrite semantics are
    // per-case: case 1's files stay)
    fleetDf(1, 3, bump = 1000.0).write
      .format("eclipse-unsmry").mode("overwrite").save(d)
    val back = spark.read.format("eclipse-unsmry").load(s"$d/*.UNSMRY")
      .select(col("CASE"), col("VALUE")).collect()
      .map(r => (r.getString(0).split('/').last, r.getDouble(1)))
    val (c0, c1) = back.partition(_._1 == "CASE0")
    assert(c0.nonEmpty && c0.forall(_._2 >= 1000.0))
    assert(c1.nonEmpty && c1.forall(_._2 < 1000.0))
  }

  test("read-only formats refuse writes with a clear error") {
    val e = intercept[Exception] {
      fleetDf(1, 2).write.format("eclipse-unrst").mode("append").save(tmpDir("ro"))
    }
    // Spark refuses before reaching the table: unrst advertises no
    // BATCH_WRITE capability, so the save falls into the disallowed
    // CTAS path with the provider named in the error
    assert(e.getMessage.contains("read-only") ||
      e.getMessage.contains("does not support") ||
      e.getMessage.contains("does not allow"), e.getMessage)
  }

  test("missing required columns fail loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("CASE0", 1.0)).toDF("CASE", "VALUE").write
        .format("eclipse-unsmry").mode("append").save(tmpDir("cols"))
    }
    assert(e.getMessage.contains("VECTOR") || e.getMessage.contains("DATE"),
      e.getMessage)
  }
}
