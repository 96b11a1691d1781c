package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The binary formats as MICRO_BATCH streaming sources: arriving case
  * files become input partitions, offsets are the processed-file set in
  * the checkpoint log, and a restart processes only new cases. q178
  * gates stream-equals-batch against DuckDB; these tests pin the offset
  * mechanics and recovery.
  */
class EclStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-eclstream-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeCase(dir: String, c: Int): Unit = {
    import spark.implicits._
    val rows = for {
      (v, vi) <- Seq("FOPR", "WBHP:W0").zipWithIndex
      t <- 0 until 4
    } yield (v, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(t)),
      10.0 * vi + t + 100.0 * c)
    graft.write.SummaryWriter.write(rows.toDF("VECTOR", "DATE", "VALUE"), s"$dir/CASE$c")
  }

  test("offset json round-trips, including escaping") {
    import graft.io.datasource.EclFilesOffset
    val o = EclFilesOffset(Seq("/a/b/CASE0.UNSMRY", "/odd \"quoted\"/x.UNSMRY",
      "/ctrl\tchar\nno.UNSMRY", "/back\\slash.UNSMRY"))
    val back = EclFilesOffset.fromJson(o.json())
    assert(back.files.sorted === o.files.sorted)
    assert(EclFilesOffset.fromJson(EclFilesOffset(Nil).json()).files.isEmpty)
    // equality is SET equality (canonical order), not Seq order — the
    // engine compares freshly listed vs checkpoint-deserialized offsets
    val a = EclFilesOffset(Seq("/z.UNSMRY", "/a.UNSMRY", "/m.UNSMRY"))
    val b = EclFilesOffset(Seq("/m.UNSMRY", "/z.UNSMRY", "/a.UNSMRY"))
    assert(a === b && a.hashCode === b.hashCode)
    assert(EclFilesOffset.fromJson(a.json()) === a)
  }

  test("maxCasesPerTrigger rejects zero and non-numeric values") {
    val src = tmpDir("badopt")
    writeCase(src, 0)
    def start(v: String) = spark.readStream.format("eclipse-unsmry")
      .option("maxCasesPerTrigger", v).load(s"$src/*.UNSMRY")
      .writeStream.format("memory").queryName(s"bad_$v".replace('.', '_'))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val e0 = intercept[Exception] { val q = start("0"); q.awaitTermination() }
    assert(e0.getMessage.contains("maxCasesPerTrigger") ||
      Option(e0.getCause).exists(_.getMessage.contains("maxCasesPerTrigger")))
    val eN = intercept[Exception] { val q = start("lots"); q.awaitTermination() }
    assert(eN.getMessage.contains("maxCasesPerTrigger") ||
      Option(eN.getCause).exists(_.getMessage.contains("maxCasesPerTrigger")))
  }

  test("streamed unsmry fleet equals the batch read; restart resumes the offset log") {
    val src = tmpDir("src")
    val root = tmpDir("run")
    val out = s"$root/out"
    val cp = s"$root/cp"
    def runOnce(): Long = {
      val q = spark.readStream.format("eclipse-unsmry").load(s"$src/*.UNSMRY")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      Option(q.lastProgress).map(_.numInputRows).getOrElse(0L)
    }
    // phase 1: two cases
    (0 until 2).foreach(writeCase(src, _))
    val rows1 = runOnce()
    assert(rows1 === 2 * 2 * 4) // 2 cases x 2 vectors x 4 steps
    // phase 2: two more cases land; restart from the SAME checkpoint
    (2 until 4).foreach(writeCase(src, _))
    val rows2 = runOnce()
    assert(rows2 === 2 * 2 * 4, "restart must process ONLY the new cases")
    // the union equals the batch read row for row
    val streamed = spark.read.parquet(out)
      .select("CASE", "DATE", "VECTOR", "VALUE", "STEP")
      .collect().map(_.toSeq).toSet
    val batch = spark.read.format("eclipse-unsmry").load(s"$src/*.UNSMRY")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("an empty source directory streams zero rows without erroring") {
    val src = tmpDir("empty")
    val sink = "ecl_empty_sink"
    spark.catalog.dropTempView(sink)
    val q = spark.readStream.format("eclipse-unsmry").load(s"$src/*.UNSMRY")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(sink).count() === 0)
  }

  test("streaming unrst: vectors option prunes columns; a WHERE DATE is row-correct") {
    import graft.io.EclKw
    import graft.io.EclKw.Kw
    val src = tmpDir("unrst")
    (0 until 2).foreach { c =>
      EclKw.write(s"$src/CASE$c.UNRST", (0 until 3).flatMap { t =>
        val intehead = Array.tabulate(67) {
          case 11 => 6; case 64 => 1 + t; case 65 => 4; case 66 => 2024; case _ => 0
        }
        Seq(Kw("SEQNUM", "INTE", Array(t)), Kw("INTEHEAD", "INTE", intehead),
          Kw("PRESSURE", "REAL", Array.tabulate(6)(a => a + 10f * t + 100f * c)))
      })
    }
    val sink = "ecl_unrst_sink"
    spark.catalog.dropTempView(sink)
    val q = spark.readStream.format("eclipse-unrst")
      .option("vectors", "PRESSURE").load(s"$src/*.UNRST")
      .where(col("DATE") === lit(java.sql.Date.valueOf("2024-04-02")))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).collect()
    assert(got.length === 2 * 6) // 2 cases x 6 cells, ONE step
    assert(got.forall(_.getDate(1).toString == "2024-04-02"))
  }

  test("streaming filters: a WHERE is row-correct but NOT byte-level; filter.* options are") {
    import graft.io.DecodeStats
    val src = tmpDir("vecstream")
    (0 until 2).foreach(writeCase(src, _))
    def run(sink: String, withOption: Boolean): Unit = {
      spark.catalog.dropTempView(sink)
      val reader = spark.readStream.format("eclipse-unsmry")
      val df = (if (withOption) reader.option("filter.vectors", "FOPR") else reader)
        .load(s"$src/*.UNSMRY")
        .where(col("VECTOR") === "FOPR") // row-level guard either way
      val q = df.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // bare WHERE: rows are right, but Spark never pushes a stream's
    // filter into the scan — every PARAMS record fully decodes (this is
    // the documented limitation the filter.* options exist for)
    DecodeStats.unsmryParams.reset()
    DecodeStats.unsmryParamSlots.reset()
    run("ecl_vec_where", withOption = false)
    assert(spark.table("ecl_vec_where").count() === 2 * 4)
    assert(DecodeStats.unsmryParams.sum() === 2 * 4)
    assert(DecodeStats.unsmryParamSlots.sum() === 0)
    // filter.vectors option: same rows, slot decode only — the byte-
    // level route for streaming (same kernel as batch VECTOR pushdown)
    DecodeStats.unsmryParams.reset()
    DecodeStats.unsmryParamSlots.reset()
    run("ecl_vec_opt", withOption = true)
    val got = spark.table("ecl_vec_opt").collect()
    assert(got.length === 2 * 4 && got.forall(_.getString(2) == "FOPR"))
    assert(DecodeStats.unsmryParams.sum() === 0,
      "filter.vectors must ride the slot kernel in-stream")
    assert(DecodeStats.unsmryParamSlots.sum() === 2 * 4 * 2)
  }

  test("streaming filter.dates skips whole report steps at the byte level") {
    import graft.io.{DecodeStats, EclKw}
    import graft.io.EclKw.Kw
    val src = tmpDir("datestream")
    (0 until 2).foreach { c =>
      EclKw.write(s"$src/CASE$c.UNRST", (0 until 5).flatMap { t =>
        val intehead = Array.tabulate(67) {
          case 11 => 6; case 64 => 1 + t; case 65 => 4; case 66 => 2024; case _ => 0
        }
        Seq(Kw("SEQNUM", "INTE", Array(t)), Kw("INTEHEAD", "INTE", intehead),
          Kw("PRESSURE", "REAL", Array.tabulate(6)(a => a + 10f * t + 100f * c)))
      })
    }
    val sink = "ecl_dates_sink"
    spark.catalog.dropTempView(sink)
    DecodeStats.unrstVecPayloads.reset()
    val q = spark.readStream.format("eclipse-unrst")
      .option("vectors", "PRESSURE")
      .option("filter.dates", "2024-04-02")
      .load(s"$src/*.UNRST")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).collect()
    assert(got.length === 2 * 6)
    assert(got.forall(_.getDate(1).toString == "2024-04-02"))
    // one step of five decoded per case — the other SEQNUM groups'
    // payloads seeked past in-stream
    assert(DecodeStats.unrstVecPayloads.sum() === 2)
  }

  test("filter.* options: wrong formats, degenerate values and bad dates all throw") {
    val src = tmpDir("badfilter")
    writeCase(src, 0)
    def failing(kind: String, key: String, value: String): Unit = {
      val e = intercept[Exception] {
        val q = spark.readStream.format(kind).option(key, value)
          .load(s"$src/*.UNSMRY")
          .writeStream.format("memory")
          .queryName(s"bad_${key.replace('.', '_')}_${value.hashCode.abs}")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains(key) || msgs.contains("Text") /* date parse */,
        s"$key=$value: expected a loud failure naming the option, got: $msgs")
    }
    // wrong format: filter.wells / filter.vectors are not unsmry options
    failing("eclipse-unsmry", "filter.wells", "W1")
    // degenerate values must not silently no-op (they would also bypass
    // the per-format guards)
    failing("eclipse-unsmry", "filter.vectors", " , ")
    failing("eclipse-unsmry", "filter.dates", " , ")
    failing("eclipse-unsmry", "filter.dates", "..")
    // malformed date
    failing("eclipse-unsmry", "filter.dates", "2021-1-5")
    // inverted range: matches nothing — the same silent no-op class as
    // the degenerate values above (ADVICE r12)
    failing("eclipse-unsmry", "filter.dates", "2022-05-01..2022-01-01")
    // and filter.vectors on a non-unsmry format
    val e = intercept[Exception] {
      val q = spark.readStream.format("eclipse-unrst")
        .option("vectors", "PRESSURE").option("filter.vectors", "PRESSURE")
        .load(s"$src/*.UNRST")
        .writeStream.format("memory").queryName("bad_vec_unrst")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("filter.vectors"))))
  }

  test("filter.cases prunes the streaming listing (emitted-CASE values, i.e. paths)") {
    val src = tmpDir("fcases")
    (0 until 3).foreach(writeCase(src, _))
    val sink = "ecl_fcases_sink"
    spark.catalog.dropTempView(sink)
    // the emitted CASE for unsmry = path minus .UNSMRY (caseIdOf)
    val q = spark.readStream.format("eclipse-unsmry")
      .option("filter.cases", s"$src/CASE1")
      .load(s"$src/*.UNSMRY")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).collect()
    assert(got.length === 2 * 4) // ONE case of three
    assert(got.forall(_.getString(0) == s"$src/CASE1"))
  }

  test("filter.cases naming no listed case fails loudly on a batch read") {
    // a basename instead of the emitted path-minus-extension form would
    // otherwise silently yield zero rows — the one filter.* misuse that
    // used to no-op (ADVICE r12). Batch only: a streaming filter.cases
    // may name a case whose file lands later.
    val src = tmpDir("fcases-miss")
    (0 until 2).foreach(writeCase(src, _))
    val e = intercept[Exception] {
      spark.read.format("eclipse-unsmry")
        .option("filter.cases", "CASE1")
        .load(s"$src/*.UNSMRY").collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(m =>
        m.contains("filter.cases") && m.contains("CASE1"))))
    // the correct (emitted-CASE) form still reads
    val ok = spark.read.format("eclipse-unsmry")
      .option("filter.cases", s"$src/CASE1").load(s"$src/*.UNSMRY").collect()
    assert(ok.nonEmpty && ok.forall(_.getString(0) == s"$src/CASE1"))
  }

  test("q202: kill at batch N commits exactly N, the restart drains to M, no case twice") {
    val (df, b1, b2) =
      graft.queries.BinaryGate.summaryStreamKillRun(spark, "/root/testdata/sf0.001")
    // run 1 dies ON batch killAt = M/2 = 2 — batches 0 and 1 are in the
    // commit log, the in-flight batch's offsets are in the offset log
    assert(b1 === 2L, "the injected kill must land after exactly 2 commits")
    // run 2 continues the SAME batch-id sequence: replayed batch 2, then 3
    assert(b2 === 4L, "cumulative batch ids must continue across the restart")
    val rows = df.collect()
    // every (case, vector, date) exactly once — a committed-batch replay
    // or a double-decode of the in-flight case would show as duplicates
    assert(rows.length === 4 * 5 * 30)
    val keys = rows.map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2)))
    assert(keys.distinct.length === keys.length)
  }
}
