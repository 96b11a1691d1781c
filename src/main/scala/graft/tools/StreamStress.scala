package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale proof for the streaming path (§2.10): drives [[graft.streaming
  * .EventStreams]] through a MULTI-BATCH incremental run — `nfiles`
  * event files arriving one micro-batch at a time (`maxFilesPerTrigger
  * = 1`), the q58 windowed aggregate accumulating state across batches —
  * and reconciles the final complete-mode table against the one-shot
  * batch answer. This is the property the q58 gate can't show (its
  * AvailableNow run over one file usually lands in a single batch):
  * state carried across `nfiles` batches yields EXACTLY the batch
  * result, with the exact-long sum making the comparison bit-equal.
  *
  * Usage: runMain graft.tools.StreamStress [nfiles] [rowsPerFile]
  * (defaults 20 × 500k = 10M events)
  */
object StreamStress {

  def main(args: Array[String]): Unit = {
    val nfiles = args.headOption.map(_.toInt).getOrElse(20)
    val rowsPerFile = args.drop(1).headOption.map(_.toInt).getOrElse(500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned planning for the eclipse-* DSv2 sources:
      // set at SESSION BIRTH everywhere queries run, so plan shapes never
      // depend on whether a fleet gate ran first (review finding)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // checkpoint checksums off: measured r13 state-commit serialization
      // (see Bench.scala) — same setting everywhere queries run
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // v2 in the path = generator-formula version: bump when the closed
    // form changes, or a cached dataset from the old formula would be
    // silently reused by the exists() guard below
    val dir = s"/tmp/graft-stream-stress-v2-$nfiles-$rowsPerFile"
    val heapMb = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"heap=${heapMb}MB nfiles=$nfiles rowsPerFile=$rowsPerFile")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // one FLAT parquet file per "arrival" (events_0000.parquet, ... —
    // the per-report-step layout readEvents' glob expects): 90 days of
    // events, ts/type/value closed-form over the global row id
    if (!new java.io.File(f"$dir/events_${nfiles - 1}%04d.parquet").exists()) {
      timed(s"materialize $nfiles files x $rowsPerFile rows") {
        new java.io.File(dir).mkdirs()
        val types = Array("view", "click", "purchase", "signup", "error")
        (0 until nfiles).foreach { f =>
          val tmp = s"$dir/_tmp"
          spark.range(f.toLong * rowsPerFile, (f + 1).toLong * rowsPerFile)
            .select(
              col("id").as("event_id"),
              timestamp_seconds(lit(1704067200L) + pmod(col("id") * 7919L, lit(90L * 86400)))
                .as("ts"),
              pmod(col("id"), lit(10000L)).as("user_id"),
              element_at(typedLit(types.toSeq), (pmod(col("id"), lit(5L)) + 1).cast("int"))
                .as("event_type"),
              (pmod(col("id") * 31L, lit(10000L)).cast("double") / 100.0).as("value"),
              lit("{}").as("props"))
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(f"$dir/events_$f%04d.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/_tmp"))
      }
    }

    def agg(events: DataFrame): DataFrame =
      graft.streaming.EventStreams.dailyActivityExact(events)

    val batch = timed("batch answer") {
      agg(graft.sources.Tables.normalizeEventTs(
          spark.read.option("pathGlobFilter", "events*.parquet").parquet(dir)))
        .select(col("window.start").as("ws"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy(col("ws"), col("event_type"))
        .collect().toSeq
    }

    val streamed = timed(s"streamed answer ($nfiles incremental batches)") {
      spark.catalog.dropTempView("stream_stress_sink")
      val q = agg(graft.streaming.EventStreams.readEvents(spark, dir,
            Map("maxFilesPerTrigger" -> "1"))
          .withWatermark("ts", "2 hours"))
        .writeStream.format("memory").queryName("stream_stress_sink")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // recentProgress caps at 100 entries; batchId counts from 0 on
      // the fresh per-run checkpoint, so lastProgress gives the true count
      val batches = q.lastProgress.batchId + 1
      println(s"micro-batches executed: $batches")
      require(batches > 1, s"expected a multi-batch run, got $batches")
      spark.table("stream_stress_sink")
        .select(col("window.start").as("ws"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy(col("ws"), col("event_type"))
        .collect().toSeq
    }

    require(streamed == batch,
      s"stream/batch mismatch: ${streamed.size} vs ${batch.size} rows")
    println(s"OK: ${streamed.size} windows bit-equal across ${nfiles} incremental batches")

    // ---- stream-stream interval join under incremental arrivals ----
    // The q134 join replayed over `nfiles` micro-batches. This needs
    // TIME-ORDERED arrivals (each file above spans the full 90 days, so
    // the watermark would jump to max after batch 1 and evict state the
    // later batches still match against — correct engine behavior, but
    // it would test the drop path, not state carry). Here file f covers
    // the f-th slice of the timeline with ±30 min in-file jitter —
    // bounded disorder well inside the 2 h watermark — so join state
    // genuinely carries matches ACROSS batch boundaries and is evicted
    // behind the advancing watermark (numRowsTotal stays bounded).
    // v3: event_type decorrelated from user_id (id%5 is a function of
    // id%U for U ≡ 0 mod 5 — every user had one type, empty join) AND
    // 1000 users instead of 10000: same-user events arrive ~13 min
    // apart (10 M events / 90 d / 1000 users), so the 1-hour interval
    // actually spans several candidate clicks; at 10000 users the
    // same-user gap was 2.16 h and the join was structurally empty
    val dirJ = s"/tmp/graft-stream-stress-join-v3-$nfiles-$rowsPerFile"
    val total = nfiles.toLong * rowsPerFile
    val spanSec = 90L * 86400
    if (!new java.io.File(f"$dirJ/events_${nfiles - 1}%04d.parquet").exists()) {
      timed(s"materialize time-ordered $nfiles files") {
        new java.io.File(dirJ).mkdirs()
        val types = Array("view", "click", "purchase", "signup", "error")
        (0 until nfiles).foreach { f =>
          val tmp = s"$dirJ/_tmp"
          spark.range(f.toLong * rowsPerFile, (f + 1).toLong * rowsPerFile)
            .select(
              col("id").as("event_id"),
              timestamp_seconds(lit(1704067200L)
                + (col("id") * spanSec) / total
                + pmod(col("id") * 7919L, lit(3600L)) - 1800L).as("ts"),
              pmod(col("id"), lit(1000L)).as("user_id"),
              element_at(typedLit(types.toSeq),
                (pmod(expr("id div 1000") + col("id"), lit(5L)) + 1).cast("int"))
                .as("event_type"),
              (pmod(col("id") * 31L, lit(10000L)).cast("double") / 100.0).as("value"),
              lit("{}").as("props"))
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(f"$dirJ/events_$f%04d.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dirJ/_tmp"))
      }
    }

    def joinSides(ev: DataFrame): DataFrame = {
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      views.join(clicks,
        expr("user_id = c_user AND click_ts > view_ts AND " +
          "click_ts <= view_ts + interval 1 hour"))
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("view_ts"), col("click_ts"))
    }

    // persisted: consumed three times below (count + two exceptAll)
    val batchJoin = timed("batch join answer") {
      joinSides(graft.sources.Tables.normalizeEventTs(
        spark.read.option("pathGlobFilter", "events*.parquet").parquet(dirJ)))
        .persist()
    }
    val nBatchPairs = batchJoin.count()

    timed(s"streamed interval join ($nfiles incremental batches)") {
      spark.catalog.dropTempView("stream_stress_join_sink")
      val ev = graft.streaming.EventStreams.readEvents(spark, dirJ,
        Map("maxFilesPerTrigger" -> "1"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
        .withWatermark("view_ts", "2 hours")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "2 hours")
      val q = views.join(clicks,
          expr("user_id = c_user AND click_ts > view_ts AND " +
            "click_ts <= view_ts + interval 1 hour"))
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("view_ts"), col("click_ts"))
        .writeStream.format("memory").queryName("stream_stress_join_sink")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.lastProgress.batchId + 1
      require(batches > 1, s"expected a multi-batch run, got $batches")
      // bounded state: the join buffer must hold a watermark-window of
      // events, not the whole stream
      val maxState = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
      println(s"micro-batches: $batches, max join state rows: $maxState " +
        s"(stream total: $total)")
      require(maxState < total / 4,
        s"join state $maxState not bounded vs $total events")
    }
    val streamJoin = spark.table("stream_stress_join_sink")
    val missing = batchJoin.exceptAll(streamJoin).count()
    val extra = streamJoin.exceptAll(batchJoin).count()
    batchJoin.unpersist(blocking = false)
    require(missing == 0 && extra == 0,
      s"join stream/batch mismatch: missing=$missing extra=$extra of $nBatchPairs")
    println(s"OK: $nBatchPairs join pairs identical across incremental batches")

    // ---- TTL signature dedup under incremental arrivals ----
    // q163's flatMapGroupsWithState family at volume: 1M documents in
    // nfiles doc_id-ordered arrivals, TTL = 10k docs of event time.
    // Even doc_ids cycle through 200 DENSE content classes (recur every
    // 400 ids — inside the TTL, so chains never reset: every occurrence
    // after a class's first is a dup); odd doc_ids are all UNIQUE
    // content (singleton chains). Closed form: n_dup = n_even − 200.
    // The state-store bound is the point: distinct signatures ever ≈
    // 200 + n/2, but live state is only the TTL horizon (200 dense +
    // ~TTL/2 sparse keys) — EventTimeTimeout must evict the rest.
    // docsPerFile*nfiles (NOT the min target) is what's materialized —
    // recompute nDocs after the integer division so non-divisible
    // [nfiles] args don't fail the closed-form requires spuriously.
    // The closed forms below additionally assume nDocs >= 400 (all 200
    // dense classes occur at least twice) and no 31-bit signature
    // collisions inside the TTL horizon — deterministic and verified at
    // the default 20x50k parameterization.
    val docsPerFile = math.min(nfiles.toLong * rowsPerFile, 1000000L) / nfiles
    val nDocs = docsPerFile * nfiles
    require(nDocs >= 400, s"TTL section needs >= 400 docs, got $nDocs")
    val dirT = s"/tmp/graft-stream-stress-ttl-v1-$nfiles-$docsPerFile"
    if (!new java.io.File(f"$dirT/documents_${nfiles - 1}%04d.parquet").exists()) {
      timed(s"materialize $nfiles doc files x $docsPerFile rows") {
        new java.io.File(dirT).mkdirs()
        (0 until nfiles).foreach { f =>
          val tmp2 = s"$dirT/_tmp"
          spark.range(f * docsPerFile, (f + 1) * docsPerFile)
            .select(
              col("id").as("doc_id"),
              when(pmod(col("id"), lit(2L)) === 0,
                  concat(lit("dense"), pmod(col("id"), lit(400L))))
                .otherwise(concat(lit("uniq"), col("id"))).as("text"),
              lit("en").as("lang"), lit("s0").as("source"),
              lit(8L).as("n_chars"))
            .coalesce(1).write.mode("overwrite").parquet(tmp2)
          val part = new java.io.File(tmp2).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = java.nio.file.Paths.get(f"$dirT/documents_$f%04d.parquet")
          java.nio.file.Files.move(part.toPath, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + f * 1000L))
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dirT/_tmp"))
      }
    }
    // TTL scales with the corpus (1%, floored at 500 so the 400-id
    // dense recurrence always chains) — a fixed TTL wider than a small
    // corpus would leave nothing to evict and fail the bound vacuously
    val ttlDocs = math.max(500L, nDocs / 100)
    timed(s"TTL signature dedup ($nfiles incremental batches, $nDocs docs)") {
      spark.catalog.dropTempView("stream_stress_ttl_sink")
      val stream = graft.streaming.EventStreams
        .readDocuments(spark, dirT, Map("maxFilesPerTrigger" -> "1"))
        .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id") * 60L))
        .select(col("doc_id"), col("ts"), col("text"))
      val q = graft.streaming.EventStreams
        .signatureDedupedTtl(stream, ttlDocs * 60000L, "5 minutes")
        .writeStream.format("memory").queryName("stream_stress_ttl_sink")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.lastProgress.batchId + 1
      require(batches > 1, s"expected a multi-batch run, got $batches")
      val maxState = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      val out = spark.table("stream_stress_ttl_sink")
      val total = out.count()
      val dups = out.filter(col("is_dup")).count()
      val nEven = (nDocs + 1) / 2
      require(total == nDocs, s"row count $total != $nDocs")
      require(dups == nEven - 200,
        s"dup count $dups != closed form ${nEven - 200}")
      // distinct signatures ever = 200 dense + nDocs/2 unique; live
      // state must stay at the TTL horizon (200 dense + ~ttl/2 sparse)
      // plus at most ~2 batches of eviction lag (timeouts fire at batch
      // boundaries behind the watermark) — NOT the signature universe
      val sigUniverse = 200L + nDocs / 2
      val stateBound = 200L + ttlDocs + 2 * docsPerFile
      println(s"micro-batches: $batches, max dedup state rows: $maxState " +
        s"(signature universe: $sigUniverse, bound: $stateBound)")
      require(maxState < stateBound,
        s"state $maxState exceeds horizon+lag bound $stateBound " +
          s"(universe $sigUniverse)")
    }
    spark.stop()
  }
}
