package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up stress harness: materializes a key-shifted ×N copy of an sf
  * directory under /tmp and times representative queries against both, so
  * scaling behavior (linear vs super-linear) is measured, not guessed.
  *
  * Key columns are shifted per replica (ids stay unique, key cardinality
  * scales with volume) — the shapes that should scale linearly (scans,
  * hash aggs, window-per-key, LSH bucketing) can be told apart from any
  * that accidentally scale quadratically.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ScaleStress [factor]
  * [queryNameSubstring ...] — with name filters, only matching table
  * queries run (corpus rows skipped); iteration aid, the round sweep
  * runs everything.
  */
object ScaleStress {

  private val IdShift = 1000000000L

  private def replicate(df: DataFrame, factor: Int, idCols: Seq[String]): DataFrame = {
    val r = df.withColumn("__rep", explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    idCols.foldLeft(r)((d, c) => d.withColumn(c, col(c) + col("__rep") * IdShift))
      .drop("__rep")
  }

  def main(args: Array[String]): Unit = {
    // factor is optional before the name filters: take it only if numeric
    val factor = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(10)
    val only = args.dropWhile(_.forall(_.isDigit)).toSeq
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft-sfx$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned planning for the eclipse-* DSv2 sources:
      // set at SESSION BIRTH everywhere queries run, so plan shapes never
      // depend on whether a fleet gate ran first (review finding)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // checkpoint checksums off: measured r13 state-commit serialization
      // (see Bench.scala) — same setting everywhere queries run
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // peak task execution memory (shuffle/agg/sort buffers) across the
    // whole run — the number that proves a row held task memory bounded
    // at ×N, not just finished; printed per row as a running max
    val peakTaskMem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) peakTaskMem.getAndAccumulate(m.peakExecutionMemory, math.max)
      }
    })
    // the listener bus is ASYNC: drain it before reading or resetting,
    // or late onTaskEnd events from the previous (base) run bleed into
    // the xN row's peak — and the xN run's own tail events can land
    // after the print (the r10 ADVICE item)
    // listenerBus is private[spark] (Scala-level only — public in
    // bytecode), so reach it reflectively; this is a measurement tool,
    // not library surface
    def drainBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(30000L))
    }
    def peakMb: Long = { drainBus(); peakTaskMem.get() >> 20 }
    def resetPeak(): Unit = { drainBus(); peakTaskMem.set(0) }
    // events.parquet has shipped as TIMESTAMP(NANOS) (rounds 1-6) and
    // TIMESTAMP(MICROS, NTZ) (round 8+): nanosAsLong makes the nanos form
    // readable, the replicated copy keeps whichever raw shape the source
    // has, and Tables.normalizeEventTs adapts on read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    if (!new java.io.File(s"$dst/lineitem.parquet").exists()) {
      println(s"-- materializing $dst (factor $factor)")
      def w(name: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      import graft.sources.Tables
      w("lineitem", replicate(Tables.lineitem(spark, src), factor, Seq("l_orderkey")))
      w("orders", replicate(Tables.orders(spark, src), factor, Seq("o_orderkey", "o_custkey")))
      w("customer", replicate(Tables.customer(spark, src), factor, Seq("c_custkey")))
      w("supplier", Tables.supplier(spark, src))
      w("part", Tables.part(spark, src))
      w("nation", Tables.nation(spark, src))
      w("region", Tables.region(spark, src))
      w("events", replicate(
        spark.read.parquet(s"$src/events.parquet"), // raw source ts shape preserved
        factor, Seq("event_id", "user_id")))
      w("documents", replicate(Tables.documents(spark, src), factor, Seq("doc_id")))
      w("embeddings", replicate(Tables.embeddings(spark, src), factor, Seq("vec_id")))
    }

    val names = Seq("q01_agg", "q02_join", "q04_asof", "q07_lastwins",
      "q12_running", "q24_exact_dedup", "q25_jaccard", "q26_minhash_lsh",
      "q27_simhash", "q29_cosine_neardup", "q30_ann_lsh", "q33_dropconst",
      "q36_ann_ivf", "q37_simhash_neardup", "q38_ann_ivf_kmeans",
      "q39_minhash_openvocab", "q40_ngram_jaccard", "q41_dedup_components",
      "q42_repetition", "q55_sample_mixture", "q56_dedup_materialize",
      "q57_quality_topk", "q61_decontaminate", "q64_pii_scrub",
      "q65_quant_ann", "q76_chunk", "q77_pack", "q80_quality_gate",
      "q81_token_topk", "q85_corpus_rollup", "q87_ann_pq", "q88_tokenize",
      "q91_lsh_verify", "q94_ann_ivf_pq",
      "q96_semdedup", "q97_lm_score", "q98_dup_spans", "q99_bloom_dedup",
      "q100_corpus_shuffle", "q101_inc_neardup", "q103_split_leakage",
      "q104_tfidf", "q105_line_dedup", "q106_stream_sessions",
      "q107_dup_provenance", "q108_length_percentiles",
      "q109_source_divergence", "q110_rolling", "q111_tokenize_pack",
      "q112_stream_neardup", "q113_source_dedup_rate", "q115_token_budget",
      "q116_stream_window_append", "q118_shard_dedup_trend",
      "q121_dsir_weights", "q122_temp_mixture", "q127_gopher_rules",
      "q129_hll_distinct", "q130_funnel", "q131_leakage_safe_split",
      "q133_cms_heavy_hitters", "q135_hll_merge", "q136_hist_quantiles",
      "q138_cohort_retention", "q140_partitioned_export",
      "q142_stream_hll_census", "q149_bpe_merges", "q150_winnow",
      "q153_whash_dedup", "q155_kn_continuation",
      "q158_stream_image_dedup", "q159_containment", "q160_best_rep",
      "q161_hamming_neardup", "q162_mad_outliers", "q163_stream_ttl_dedup",
      "q166_stream_pack_inc", "q169_kn_perplexity", "q170_epoch_mixture",
      "q67_curation_pipeline", "q181_cdc_dedup", "q183_source_contamination",
      "q184_kcenter_sample", "q186_bpe_canonical", "q187_cdc_incremental",
      "q188_stream_cdc_ingest", "q192_nb_quality", "q195_edit_verify",
      "q203_suffix_repeats", "q205_suffix_clip", "q207_decontam_clip",
      "q208_suffix_scrub", "q209_stream_decontam")
    // q194/q196 are deliberately NOT in the ×N sweep: the replica corpus
    // duplicates texts (q194's answer grows quadratically — output size,
    // not the operator) and replicates the BENCH docs (q196's query side
    // grows with the corpus, so the exact dense score matrix is Q×N by
    // construction on this 31-word vocabulary; production eval suites
    // are FIXED while corpora grow). See PLANS.md for both analyses.
    // one timing body for every row: a crashed run returns -1 (NOT its
    // time-to-crash — the skew rows exist to catch OOMs, which must not
    // print as a normal-looking ratio), and the cache hygiene
    // (localCheckpoint blocks are RDD persists clearCache misses — same
    // as Bench/Profile) lives in exactly one place
    def timeQuery(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir).count(); true }
        catch { case e: Throwable => println(s"$name@$dir: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      if (ok) dt else -1.0
    }
    def minOf2(name: String, dir: String): Double = {
      val ts = Seq(timeQuery(name, dir), timeQuery(name, dir))
      if (ts.exists(_ < 0)) -1.0 else ts.min
    }
    for (name <- names if only.isEmpty || only.exists(name.contains)) {
      val base = minOf2(name, src)
      resetPeak() // peak_task_mb attributes to THIS row's xN run only
      val big = minOf2(name, dst)
      if (base < 0 || big < 0)
        println(s"SCALE $name FAILED (base=$base x$factor=$big)")
      else
        println(f"SCALE $name base=${base}%.2fs x$factor=${big}%.2fs " +
          f"ratio=${big / base}%.1f peak_task_mb=$peakMb")
    }

    // q115 under organic source skew: one source holding 90% of a ×N
    // corpus — the exact shape that OOMs a per-source collect_list
    // (a CommonCrawl-style mixture). The bounded-pass first-fit must
    // hold task memory constant: only window partition slices, never a
    // whole source, regardless of the 90% source.
    if (only.isEmpty || only.exists("q115_skew".contains)) {
      val skewDst = s"/tmp/graft-sfx$factor-skew"
      if (!new java.io.File(s"$skewDst/documents.parquet").exists()) {
        println(s"-- materializing $skewDst (factor $factor, 90% one source)")
        replicate(graft.sources.Tables.documents(spark, src), factor, Seq("doc_id"))
          .withColumn("source",
            when(pmod(col("doc_id"), lit(10)) < 9, lit("megacrawl"))
              .otherwise(col("source")))
          .write.mode("overwrite").parquet(s"$skewDst/documents.parquet")
      }
      val sBase = minOf2("q115_token_budget", src)
      val sBig = minOf2("q115_token_budget", skewDst)
      if (sBase < 0 || sBig < 0)
        println(s"SCALE q115_skew FAILED (base=$sBase x${factor}skew=$sBig)")
      else
        println(f"SCALE q115_skew base=${sBase}%.2fs x${factor}skew=${sBig}%.2fs ratio=${sBig / sBase}%.1f")
    }

    // q208 under the MANY-SPANS adversary: every doc built from ~30
    // short duplicated phrases drawn from a small shared pool, so the
    // scrub must remove ~30 disjoint spans per doc corpus-wide — the
    // shape where a per-token exists() over the span array goes
    // hidden-quadratic (O(n_tokens x n_spans) per doc; review finding)
    // and the complement-slice reconstruction stays O(kept + spans).
    if (only.isEmpty || only.exists("q208_manyspans".contains)) {
      val spanDst = s"/tmp/graft-sfx$factor-manyspans"
      if (!new java.io.File(s"$spanDst/documents.parquet").exists()) {
        println(s"-- materializing $spanDst (factor $factor, ~30 spans/doc)")
        // phrase pool of 97 distinct 13-token phrases (13 >= SufL); doc d
        // concatenates 30 pool picks, each followed by a UNIQUE
        // (doc, slot) separator token — the separators keep the clipped
        // spans DISJOINT (no two phrase occurrences can chain through a
        // token that exists nowhere else), so every doc carries ~30
        // separate spans instead of one merged run
        replicate(graft.sources.Tables.documents(spark, src), factor, Seq("doc_id"))
          .withColumn("text", expr(
            """array_join(transform(sequence(0, 29), i -> concat(
                 array_join(transform(sequence(0, 12), j ->
                   concat('p', CAST(pmod(doc_id * 31 + i * 7, 97) AS STRING),
                          '_', CAST(j AS STRING))), ' '),
                 ' u', CAST(doc_id AS STRING), '_', CAST(i AS STRING))), ' ')"""))
          .write.mode("overwrite").parquet(s"$spanDst/documents.parquet")
      }
      val mBase = minOf2("q208_suffix_scrub", src)
      resetPeak()
      val mBig = minOf2("q208_suffix_scrub", spanDst)
      if (mBase < 0 || mBig < 0)
        println(s"SCALE q208_manyspans FAILED (base=$mBase x${factor}spans=$mBig)")
      else
        println(f"SCALE q208_manyspans base=${mBase}%.2fs x${factor}spans=${mBig}%.2fs " +
          f"ratio=${mBig / mBase}%.1f peak_task_mb=$peakMb")
    }

    // q158 under a ×100k historical image-hash index (the production
    // concern behind dropping the broadcast hint): synthetic
    // never-matching rows inflate the static side to ~3.2M entries, the
    // stream-static join must absorb them by shuffling — time flat vs
    // the 32-entry gate index (decode-dominated), output row-identical
    if (only.isEmpty || only.exists("q158_index".contains)) {
      def timeIdx(inflate: Int): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = graft.queries.StreamGate.streamImageDedupWith(spark, src, inflate).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      val (iBase, nBase) = timeIdx(1)
      resetPeak()
      val (iBig, nBig) = timeIdx(100000)
      require(nBase == nBig,
        s"inflated-index output drifted: $nBase vs $nBig rows")
      println(f"SCALE q158_index base=${iBase}%.2fs x100k-index=${iBig}%.2fs " +
        f"ratio=${iBig / iBase}%.1f rows=$nBase peak_task_mb=$peakMb")
    }

    // restart fleet at ×100 the gate's ensemble size, through the
    // REGISTERED DSv2 format (one input partition per case): 4 vs 400
    // UNRST cases of 2000 active cells × 3 steps — the per-case decode
    // is constant work, so the fleet must scale with the case count
    if (only.isEmpty || only.exists("q120_fleet_dsv2".contains)) {
      val fleetDir = "/tmp/graft-unrst-fleet-400"
      if (!new java.io.File(s"$fleetDir/CASE399.UNRST").exists()) {
        println(s"-- materializing $fleetDir (400 UNRST cases)")
        new java.io.File(fleetDir).mkdirs()
        // the ONE copy of the SEQNUM/INTEHEAD scaffolding (BinaryGate's
        // writer — header-layout drift would silently desync this row)
        (0 until 400).foreach { c =>
          graft.queries.BinaryGate.writeRstCaseWith(fleetDir, c,
            (a, t) => (a + 100 * t + c).toFloat,
            (a, t) => ((a + t + c) % 32) / 32f,
            nactive = 2000)
        }
      }
      def timeFleetRead(n: Int): Double = {
        val paths = (0 until n).map(c => s"$fleetDir/CASE$c.UNRST").mkString(",")
        val t0 = System.nanoTime()
        // aggregate the vectors (a bare count() would prune them away
        // and time only the INTEHEAD walk)
        spark.read.format("eclipse-unrst").option("vectors", "PRESSURE,SWAT")
          .load(paths)
          .agg(sum(col("PRESSURE")), sum(col("SWAT"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val r4 = Seq(timeFleetRead(4), timeFleetRead(4)).min
      resetPeak()
      val r400 = Seq(timeFleetRead(400), timeFleetRead(400)).min
      println(f"SCALE q120_fleet_dsv2 cases=4:${r4}%.2fs cases=400:${r400}%.2fs " +
        f"ratio=${r400 / r4}%.1f peak_task_mb=$peakMb")
      // the DATE pushdown at fleet scale: `DATE = one step` over all 400
      // cases must beat the full read (2 of 3 steps' payloads seeked
      // past per case) — the wall-clock form of EclPushdownSpec's
      // payload-count proof
      def timeFleetDate(n: Int): (Double, Long) = {
        val paths = (0 until n).map(c => s"$fleetDir/CASE$c.UNRST").mkString(",")
        graft.io.DecodeStats.unrstVecPayloads.reset()
        val t0 = System.nanoTime()
        spark.read.format("eclipse-unrst").option("vectors", "PRESSURE,SWAT")
          .load(paths)
          .where(col("DATE") === lit(java.sql.Date.valueOf("2022-01-02")))
          .agg(sum(col("PRESSURE")), sum(col("SWAT"))).collect()
        ((System.nanoTime() - t0) / 1e9, graft.io.DecodeStats.unrstVecPayloads.sum())
      }
      val (rd, decoded) = Seq(timeFleetDate(400), timeFleetDate(400)).minBy(_._1)
      println(f"SCALE q171_fleet_date_pushdown cases=400 full:${r400}%.2fs " +
        f"one_date:${rd}%.2fs payloads_decoded=$decoded (full would be ${400 * 3 * 2})")
      // RUNTIME (DPP) CASE pruning at fleet scale — the q206 gate's
      // wall-clock form: a parquet metadata dim keeping 10 of the 400
      // realizations prunes 390 files at EXECUTION time (the filter
      // lives on the dim, invisible to static pushdown); decode
      // evidence: 10 cases x 3 steps x 2 vectors, not 2400 payloads
      def timeFleetDpp(): (Double, Long) = {
        val paths = (0 until 400).map(c => s"$fleetDir/CASE$c.UNRST").mkString(",")
        val dimPath = s"$fleetDir-dim"
        if (!new java.io.File(dimPath).exists()) {
          import spark.implicits._
          (0 until 400).map(c => (s"$fleetDir/CASE$c.UNRST", if (c % 40 == 0) 1 else 0))
            .toDF("CASE", "keep").write.mode("overwrite").parquet(dimPath)
        }
        val dim = spark.read.parquet(dimPath).filter(col("keep") === 1)
        graft.io.DecodeStats.unrstVecPayloads.reset()
        val t0 = System.nanoTime()
        spark.read.format("eclipse-unrst").option("vectors", "PRESSURE,SWAT")
          .load(paths)
          .join(broadcast(dim), Seq("CASE"))
          .agg(sum(col("PRESSURE")), sum(col("SWAT"))).collect()
        ((System.nanoTime() - t0) / 1e9,
          graft.io.DecodeStats.unrstVecPayloads.sum())
      }
      val (rdpp, dppDecoded) = Seq(timeFleetDpp(), timeFleetDpp()).minBy(_._1)
      println(f"SCALE q206_fleet_dpp cases=400 keep=10 full:${r400}%.2fs " +
        f"dpp:${rdpp}%.2fs payloads_decoded=$dppDecoded (full would be ${400 * 3 * 2})")
    }

    // STREAMING drain of the 400-case ensemble through the registered
    // MICRO_BATCH source: all-at-once (one batch) vs admission-
    // controlled (maxCasesPerTrigger=50 → 8 batches). Proves the
    // streaming path absorbs a full backlog, that per-batch bounding
    // costs only the per-trigger overhead, and that rows match the
    // batch read exactly.
    if (only.isEmpty || only.exists("qstream_drain".contains)) {
      val fleetDir = "/tmp/graft-unrst-fleet-400"
      if (new java.io.File(s"$fleetDir/CASE399.UNRST").exists()) {
        def drain(maxCases: Option[Int]): (Double, Long, Long) = {
          val sink = s"drain_sink_${maxCases.getOrElse(0)}"
          spark.catalog.dropTempView(sink)
          val r0 = spark.readStream.format("eclipse-unrst")
            .option("vectors", "PRESSURE")
          val rs = maxCases.fold(r0)(n => r0.option("maxCasesPerTrigger", n.toString))
          val t0 = System.nanoTime()
          val q = rs.load(s"$fleetDir/*.UNRST")
            .writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val dt = (System.nanoTime() - t0) / 1e9
          val n = spark.table(sink).count()
          spark.catalog.dropTempView(sink)
          (dt, n, q.lastProgress.batchId + 1)
        }
        val (tAll, nAll, bAll) = drain(None)
        val (tCap, nCap, bCap) = drain(Some(50))
        require(nAll == nCap, s"drain row drift: $nAll vs $nCap")
        println(f"SCALE qstream_drain cases=400 all:${tAll}%.2fs/${bAll}b " +
          f"cap50:${tCap}%.2fs/${bCap}b rows=$nAll")
      } else println("SCALE qstream_drain SKIPPED (run q120_fleet_dsv2 first)")
    }

    // Adversarial JOIN-KEY skew for the dedup shuffle (r10 verdict #4):
    // one text — hence ONE md5 and ONE MinHash signature (8 hot band
    // buckets) — holding 50% of a ×N corpus. q24's md5 groupBy must
    // collapse the hot key map-side (partial aggregation); q41/q56's
    // component propagation joins membership(bucket) to the bucket-min
    // frame, where the hot buckets each carry half the corpus on the
    // probe side — the build side stays tiny (distinct buckets), so
    // the planner broadcasts it and the hot key never concentrates a
    // shuffle partition; AQE covers the residual. peak_task_mb is the
    // proof that no task held the mega-key's members.
    val megaNames = Seq("q24_exact_dedup", "q41_dedup_components",
      "q56_dedup_materialize", "q181_cdc_dedup", "q187_cdc_incremental",
      "q203_suffix_repeats", "q205_suffix_clip", "q207_decontam_clip",
      "q208_suffix_scrub", "q209_stream_decontam")
    val megaSel = megaNames.filter(n => only.exists(n.contains))
    // the legacy 'qdedup_megakey' token selects the FULL block even when
    // combined with specific names — a mixed filter must not silently
    // shrink the sweep (review finding)
    val megaAll = only.isEmpty || only.exists("qdedup_megakey".contains)
    if (megaAll || megaSel.nonEmpty) {
      val megaDst = s"/tmp/graft-sfx$factor-megadup"
      if (!new java.io.File(s"$megaDst/documents.parquet").exists()) {
        println(s"-- materializing $megaDst (factor $factor, 50% one text)")
        replicate(graft.sources.Tables.documents(spark, src), factor, Seq("doc_id"))
          .withColumn("text",
            when(pmod(col("doc_id"), lit(2)) === 0,
              lit("the same boilerplate page served by half the crawl " +
                "over and over again"))
              .otherwise(col("text")))
          .write.mode("overwrite").parquet(s"$megaDst/documents.parquet")
      }
      // the chunk-axis analog: 50% of the corpus sharing ONE text means
      // one chunk-hash family holds half the probe rows of q181's
      // first-occurrence join and q187's history-index join — the
      // mega-CHUNK skew those plans must survive without a task
      // concentrating the hot hash
      // q203/q205 ride the same replica: the 13-token boilerplate (≥ SufL
      // = 12) in 50% of the docs is ONE interval family with corpus/2
      // occurrences — the mega-FAMILY adversary for the lcp-interval
      // key. q203's rollup and q205's survivor pass are groupBy
      // aggregates (map-side combinable) + an AQE-splittable join, so
      // peak_task_mb must stay flat; a per-interval window would
      // concentrate the family in one task. q207 shares the adversary
      // from the OTHER side: the boilerplate lands in eval-slice docs
      // too (doc_id % 11 spans both halves), so the mega family IS a
      // contaminating interval and its corpus/2 train occurrences all
      // probe the semi-join on one interval key — the DISTINCT build
      // side stays one row and the probe side must spread. q209 meets
      // it as a mega WINDOW family: the boilerplate's L-windows match
      // eval, so corpus/2 streamed positions hit the same handful of
      // window keys — the distinct eval-window build side stays tiny
      // and the stream-side semi-join probe must spread by doc.
      for (name <- (if (megaAll) megaNames else megaSel)) {
        val b = minOf2(name, src)
        resetPeak()
        val m = minOf2(name, megaDst)
        if (b < 0 || m < 0)
          println(s"SCALE ${name}_megakey FAILED (base=$b x${factor}mega=$m)")
        else
          println(f"SCALE ${name}_megakey base=${b}%.2fs x${factor}mega=${m}%.2fs " +
            f"ratio=${m / b}%.1f peak_task_mb=$peakMb")
      }
    }

    if (only.nonEmpty) { spark.stop(); return } // filtered run: tables only

    // per-deck window scaling: the Schedule clock over a many-deck corpus
    // must scale with the number of decks, not funnel into one partition
    val deckText = (1 to 20).map(m =>
      s"DATES\n 1 'JAN' ${2000 + m} /\n/\nCOMPDAT\n 'OP1' 1 1 1 2 'OPEN' /\n/\nTSTEP\n 30 /\n")
      .mkString
    def corpus(n: Int): DataFrame =
      spark.createDataFrame(
        (0 until n).flatMap(i => graft.io.DeckParser.parse(deckText, s"deck$i")))
    def timeDecks(n: Int): Double = {
      val df = corpus(n)
      val t0 = System.nanoTime()
      graft.modules.Schedule.keywordDates(df, keepDeckId = true).count()
      (System.nanoTime() - t0) / 1e9
    }
    val (d1, d10) = (Seq(timeDecks(100), timeDecks(100)).min,
      Seq(timeDecks(1000), timeDecks(1000)).min)
    println(f"SCALE schedule_corpus decks=100:${d1}%.2fs decks=1000:${d10}%.2fs ratio=${d10 / d1}%.1f")

    // corpus-native compdat: the FULL per-deck state pipeline (WELSPECS
    // as-of, K unroll, WLIST fold, WELOPEN application, last-wins) over one
    // multi-deck frame — every operator keyed on (deckId, WELL)
    val compdatDeck = (1 to 10).map(m =>
      s"""DATES
         | 1 'JAN' ${2000 + m} /
         |/
         |WELSPECS
         | 'OP$m' 'G' $m $m /
         |/
         |COMPDAT
         | 'OP$m' 2* 1 3 'OPEN' /
         |/
         |WLIST
         | '*L$m' 'NEW' 'OP$m' /
         |/
         |WELOPEN
         | '*L$m' 'SHUT' /
         |/
         |""".stripMargin).mkString
    def timeCompdat(n: Int): Double = {
      val df = spark.createDataFrame(
        (0 until n).flatMap(i => graft.io.DeckParser.parse(compdatDeck, s"deck$i")))
      val t0 = System.nanoTime()
      graft.modules.Compdat.fromEvents(df, keepDeckId = true).count()
      (System.nanoTime() - t0) / 1e9
    }
    val (c1, c10) = (Seq(timeCompdat(100), timeCompdat(100)).min,
      Seq(timeCompdat(1000), timeCompdat(1000)).min)
    println(f"SCALE compdat_corpus decks=100:${c1}%.2fs decks=1000:${c10}%.2fs ratio=${c10 / c1}%.1f")

    // corpus-native gruptree: snapshot emission (tagged range join,
    // last-wins window, root synthesis, node data) over one multi-deck
    // frame — every key (deckId, SNAP_DATE, CHILD)
    val gruptreeDeck = (1 to 10).map(m =>
      s"""GRUPTREE
         | 'PLAT$m' 'FIELD' /
         | 'G$m' 'PLAT$m' /
         |/
         |DATES
         | 1 'JAN' ${2000 + m} /
         |/
         |WELSPECS
         | 'W$m' 'G$m' 1 2 /
         |/
         |GRUPNET
         | 'PLAT$m' ${m * 1.5} /
         |/
         |""".stripMargin).mkString
    def timeGruptree(n: Int): Double = {
      val df = spark.createDataFrame(
        (0 until n).flatMap(i => graft.io.DeckParser.parse(gruptreeDeck, s"deck$i")))
      val t0 = System.nanoTime()
      graft.modules.Gruptree.fromEvents(df, keepDeckId = true).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // Gruptree eagerly localCheckpoints its hub frames — drop the blocks
      // so the four timed runs don't contaminate each other (same hygiene
      // as Bench/Profile)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    val (g1, g10) = (Seq(timeGruptree(100), timeGruptree(100)).min,
      Seq(timeGruptree(1000), timeGruptree(1000)).min)
    println(f"SCALE gruptree_corpus decks=100:${g1}%.2fs decks=1000:${g10}%.2fs ratio=${g10 / g1}%.1f")

    // corpus-native wcon: the keyword-family union (WCONPROD/HIST/INJE/
    // INJH) + per-deck schedule clock over one multi-deck frame — the
    // clock join is keyed (deckId, keywordIdx), no cross-deck state
    val wconDeck = (1 to 10).map(m =>
      s"""WCONPROD
         | 'P$m' 'OPEN' 'ORAT' ${m * 100.0} 4* ${m * 10.0} /
         |/
         |DATES
         | 1 'JAN' ${2000 + m} /
         |/
         |WCONHIST
         | 'P$m' 'OPEN' 'ORAT' ${m * 90.0} /
         |/
         |WCONINJE
         | 'I$m' 'WATER' 'OPEN' 'RATE' ${m * 50.0} /
         |/
         |""".stripMargin).mkString
    def timeWcon(n: Int): Double = {
      val df = spark.createDataFrame(
        (0 until n).flatMap(i => graft.io.DeckParser.parse(wconDeck, s"deck$i")))
      val t0 = System.nanoTime()
      graft.modules.Wcon.fromEvents(df, keepDeckId = true).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    val (w1, w10) = (Seq(timeWcon(100), timeWcon(100)).min,
      Seq(timeWcon(1000), timeWcon(1000)).min)
    println(f"SCALE wcon_corpus decks=100:${w1}%.2fs decks=1000:${w10}%.2fs ratio=${w10 / w1}%.1f")

    // the FILE-based fleet path: same compdat pipeline but through the
    // eclipse-deck DSv2 source over a directory tree of real deck FILES
    // (size-aware bin packing groups the tiny decks into ~4×parallelism
    // tasks) — proves the corpusFromPath entry at 100 vs 1000 files,
    // listing + glob expansion + read + full state pipeline. Fixed reuse
    // path like the sfx dataset: no per-run /tmp accumulation.
    val fleetRoot = java.nio.file.Paths.get("/tmp/graft-fleet-1000")
    if (!java.nio.file.Files.isDirectory(fleetRoot.resolve("r999"))) {
      (0 until 1000).foreach { i =>
        val d = fleetRoot.resolve(s"r$i"); java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.writeString(d.resolve("DECK.DATA"), compdatDeck)
      }
    }
    def timeFleet(n: Int): Double = {
      // the n=100 list is explicit (r0..r99) rather than a bracket glob, so
      // a change to the corpus naming can't silently skew the 100-vs-1000
      // ratio; the 1000 case still exercises glob expansion
      val glob =
        if (n >= 1000) s"$fleetRoot/*/DECK.DATA"
        else (0 until n).map(i => s"$fleetRoot/r$i/DECK.DATA").mkString(",")
      val t0 = System.nanoTime()
      graft.modules.Compdat.corpusFromPath(spark, glob).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    val (f1, f10) = (Seq(timeFleet(100), timeFleet(100)).min,
      Seq(timeFleet(1000), timeFleet(1000)).min)
    println(f"SCALE fleet_files decks=100:${f1}%.2fs decks=1000:${f10}%.2fs ratio=${f10 / f1}%.1f")
    spark.stop()
  }
}
