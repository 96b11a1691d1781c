package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{PortableHash, PortableStringHash}
import graft.sources.Tables

/** Sketch operators — bounded-state cardinality summaries a 100 TB
  * corpus report needs where exact distinct counts would shuffle the
  * world. Spark's own `approx_count_distinct` is HLL++ with an opaque,
  * version-dependent register layout that no oracle can replay, so the
  * gateable variant here is a PORTABLE HyperLogLog built from the
  * engine-portable hash family ([[PortableHash]]/[[PortableStringHash]])
  * and pure integer arithmetic: both engines compute bit-identical
  * registers and a bit-identical integer estimate.
  */
object Sketches {

  /** HLL geometry: m = 64 registers (p = 6 bucket bits); the remaining
    * 25 value bits of the 31-bit portable hash feed the rank, so ρ ∈
    * [1, 26] with ρ = 26 reserved for a zero value field and ρ = 0
    * marking an empty register. Every 2^{-ρ} weight is integerized at
    * scale 2^26 (`1 << (26 - ρ)`), making the harmonic sum S an exact
    * BIGINT.
    */
  private val HllM = 64
  private val HllScaleBits = 26
  /** α_64 in millionths (0.7213/(1+1.079/64), the standard bias
    * constant) — a shared literal, so exactness never depends on it. */
  private val AlphaFp6 = 709336L
  /** α·m²·2^26 — the estimate numerator (≈1.95e17, fits BIGINT). */
  private val EstNum = AlphaFp6 * HllM * HllM * (1L << HllScaleBits)
  private val MixSeed = 7

  /** q129: PER-SOURCE DISTINCT-DOCUMENT ESTIMATE via portable HLL —
    * the corpus-census sketch (how many unique documents per source?)
    * next to its exact answer, so the gate checks BOTH the register
    * mechanics and the estimate's integer publication.
    *
    * Key = portable string hash of the text (64-cp prefix — the
    * engine-portable identity the near-dup family already uses),
    * spread by the M1-multiply mix (the q122 lesson: raw polynomial
    * hashes of structured strings band; the mix bijection spreads them
    * across [0, P) so bucket/rank bits are usable).
    *
    * Exactness: register = max ρ per (source, bucket) where ρ derives
    * from `length(bin(v))` — both engines' `bin` is the minimal binary
    * string, so ρ is integer-exact; S = Σ 2^(26−ρ) + V·2^26 is an
    * exact BIGINT; the raw estimate publishes as `EstNum // S`
    * (positive truncating division, engine-identical). No float exists
    * anywhere in the plan. Small/large-range bias corrections are
    * driver-side presentation (they need ln) — the gate pins the raw
    * estimator plus V, from which any correction is derivable.
    *
    * Scale shape: one narrow projection (hash, bucket, ρ) then a
    * (source, bucket)-keyed max — partially aggregated map-side, so
    * the exchange carries ≤ m rows per source per task REGARDLESS of
    * corpus size: this is the whole point of the sketch, and the plan
    * shows it. The exact countDistinct column is gate-side evidence
    * only (it shuffles distinct keys) — a production census drops it.
    */
  /** Per-document (source, shard, hm, bucket, rho) projection — the
    * narrow scan both HLL gates build from. `shard` (doc_id parity)
    * exists for q135's merge law and is free for q129. */
  private def hllProj(s: SparkSession, dir: String): DataFrame =
    hllProjOf(Tables.documents(s, dir))

  /** The projection over any (doc_id, source, text) frame — batch or
    * STREAMING (pure codegen column tree, no state), shared by
    * q129/q135 and the streaming census q142. */
  private def hllProjOf(docs: DataFrame): DataFrame = {
    val hm = PortableHash.mix(PortableStringHash.strHash(col("text")), MixSeed)
    docs
      .select(col("source"), pmod(col("doc_id"), lit(2L)).as("shard"), hm.as("hm"))
      .withColumn("bucket", pmod(col("hm"), lit(HllM.toLong)))
      .withColumn("v", expr(s"hm div ${HllM}"))
      .withColumn("rho",
        when(col("v") === 0, lit(HllScaleBits))
          .otherwise(lit(HllScaleBits) - length(bin(col("v")))).cast("int"))
  }

  /** Fold per-(source, bucket) registers `(source, bucket, rho)` into
    * the per-source harmonic sum and integer estimate. */
  private def hllFold(regs: DataFrame): DataFrame =
    regs.groupBy(col("source"))
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), $HllScaleBits - rho)")).as("s_filled"),
        count(lit(1)).as("n_buckets"))
      .withColumn("v_empty", lit(HllM.toLong) - col("n_buckets"))
      .withColumn("s_sum",
        col("s_filled") + col("v_empty") * lit(1L << HllScaleBits))
      .withColumn("est_e6", expr(s"($EstNum) div s_sum"))
      .select(col("source"), col("v_empty"), col("s_sum"), col("est_e6"))

  def q129HllDistinct(s: SparkSession, dir: String): DataFrame = {
    val base = hllProj(s, dir)
    val regs = hllFold(base.groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho")))
    val exact = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("hm")).as("n_exact"))
    exact.join(regs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_exact"),
        col("v_empty"), col("s_sum"), col("est_e6"))
      .orderBy(col("source"))
  }

  /** q135: HLL SHARD-MERGE LAW on the gate — the property that makes
    * the sketch THE 100 TB census tool: registers built per ingest
    * shard merge by per-bucket MAX into exactly the registers of a
    * single whole-corpus pass (max is associative/commutative), so a
    * fleet can sketch shards independently — tiny state each — and a
    * final 4096-row-scale reduce replaces any global distinct shuffle.
    * The gate computes both sides (2 shards by doc-id parity vs one
    * pass) and publishes both estimates plus the law verdict; a hash
    * match proves merged ≡ full in BOTH engines, bit for bit.
    */
  def q135HllMerge(s: SparkSession, dir: String): DataFrame = {
    val base = hllProj(s, dir)
    val full = hllFold(base.groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho")))
      .select(col("source"), col("s_sum").as("s_sum_full"),
        col("est_e6").as("est_full"))
    val shardRegs = base.groupBy(col("source"), col("shard"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    val merged = hllFold(shardRegs.groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho")))
      .select(col("source"), col("s_sum").as("s_sum_merged"),
        col("est_e6").as("est_merged"))
    val nShards = base.groupBy(col("source"))
      .agg(countDistinct(col("shard")).as("n_shards"))
    full.join(merged, Seq("source")).join(nShards, Seq("source"))
      .select(col("source"), col("n_shards"),
        col("s_sum_full"), col("s_sum_merged"),
        col("est_full"), col("est_merged"),
        (col("s_sum_full") === col("s_sum_merged")).as("merge_ok"))
      .orderBy(col("source"))
  }

  /** q136: LOG-HISTOGRAM QUANTILE SKETCH — bounded-state percentile
    * estimation (the companion to q108's exact percentiles, for the
    * scale where an exact per-source sort is not worth its shuffle):
    * bucket = bit length of n_chars (64 buckets cover all of BIGINT),
    * per-source histogram, then the smallest bucket whose cumulative
    * count crosses the rank — every comparison CROSS-MULTIPLIED
    * (2·cum ≥ n for p50, 20·cum ≥ 19·n for p95) so no division exists.
    * Publishes each quantile's bucket plus its [2^(b−1), 2^b−1] hull.
    *
    * Scale shape: one narrow projection, a (source, bucket)-keyed count
    * (exchange ≤ 64 rows per source per task), then windows over ≤ 64
    * rows per source. The estimate's error is the bucket width (a
    * factor-of-2 hull) — the trade that buys fixed state.
    */
  def q136HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Tables.documents(s, dir)
      .select(col("source"),
        when(col("n_chars") === 0, lit(0))
          .otherwise(length(bin(col("n_chars")))).cast("int").as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cum = h
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("source")).orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("source"))))
    cum.groupBy(col("source"), col("n"))
      .agg(
        min(when(col("cum") * 2 >= col("n"), col("bucket"))).as("p50_bucket"),
        min(when(col("cum") * 20 >= col("n") * 19, col("bucket"))).as("p95_bucket"))
      .select(col("source"), col("n").as("n_docs"),
        col("p50_bucket"),
        expr("CASE WHEN p50_bucket = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftleft(cast(1 as bigint), p50_bucket - 1) END").as("p50_lo"),
        expr("shiftleft(cast(1 as bigint), p50_bucket) - 1").as("p50_hi"),
        col("p95_bucket"),
        expr("CASE WHEN p95_bucket = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftleft(cast(1 as bigint), p95_bucket - 1) END").as("p95_lo"),
        expr("shiftleft(cast(1 as bigint), p95_bucket) - 1").as("p95_hi"))
      .orderBy(col("source"))
  }

  /** CMS geometry: d = 4 hash rows, w = 1024 buckets → 4096 counters
    * total, the fixed footprint regardless of corpus size. */
  private val CmsD = 4
  private val CmsW = 1024L
  private val CmsSeed = 21
  private val CmsTopK = 20

  /** q133: COUNT-MIN-SKETCH HEAVY HITTERS — the token-frequency census
    * (which boilerplate tokens dominate the corpus?) under a bounded
    * sketch: per token occurrence, d portable-hash rows increment one
    * of w counters each; a token's estimate is the MIN over its d
    * counters (Cormode & Muthukrishnan 2005), always ≥ the exact count.
    * The gate emits the exact top-[[CmsTopK]] tokens next to their CMS
    * estimates, so it pins BOTH the counter build and the probe path.
    *
    * Exactness: counters are integer counts of mix-bucket membership —
    * the same [[PortableHash.mix]]/[[PortableStringHash]] family both
    * engines replay bit-identically; min/count/sum over BIGINTs, no
    * float anywhere.
    *
    * Scale shape: the counter build explodes each occurrence ×d but
    * partial-aggregates map-side, so the exchange carries ≤ d·w = 4096
    * rows per task REGARDLESS of corpus size (the sketch's point — at
    * 100 TB the counter table is still 4096 rows). Candidate selection
    * is TakeOrdered (per-partition top-k, no global window over the
    * vocabulary); the probe joins the 4096-row counter frame BROADCAST.
    */
  def q133CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = Tables.documents(s, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("tok"), PortableStringHash.strHash(col("tok")).as("v"))
    def rowBuckets = array((0 until CmsD).map { r =>
      struct(lit(r).as("r"),
        pmod(PortableHash.mix(col("v"), CmsSeed + r), lit(CmsW)).as("bucket"))
    }: _*)
    val cms = occ.select(explode(rowBuckets).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val top = occ.groupBy(col("tok"), col("v"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok"))
      .limit(CmsTopK)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n_exact").desc, col("tok"))))
    top.select(col("tok"), col("n_exact"), col("rk"), explode(rowBuckets).as("rb"))
      .select(col("tok"), col("n_exact"), col("rk"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("r", "bucket"))
      .groupBy(col("tok"), col("n_exact"), col("rk"))
      .agg(min(col("cnt")).as("n_cms"))
      .select(col("tok"), col("n_exact"), col("n_cms"), col("rk"))
      .orderBy(col("rk"))
  }

  /** q142: the HLL census RUN BY THE STREAMING ENGINE — registers as
    * streaming aggregation state: the same projection as q129 over a
    * documents readStream, `max(rho)` per (source, bucket) accumulated
    * across micro-batches (state = sources × 64 registers, the
    * CONTINUOUS census a 100 TB ingest keeps; no watermark needed —
    * register max is monotone, so complete-mode state is the sketch
    * itself and never grows past m rows per source). The batch-side
    * fold publishes the same integer estimate as q129, so the oracle
    * is q129's register/estimate math verbatim — a hash match proves
    * the streaming accumulation path lands on bit-identical registers.
    */
  def q142StreamHllCensus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val regs = hllProjOf(
        graft.streaming.EventStreams.readDocuments(s, dir)
          .select(col("doc_id"), col("source"), col("text")))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    val sink = "q142_sink"
    s.catalog.dropTempView(sink)
    // scale-adaptive state partitions for the stateful census (guide §2;
    // see StreamTune) — results are partitioning-invariant
    graft.streaming.StreamTune.withAdaptiveStreamShuffle(s, s"$dir/documents.parquet") {
      val q = regs.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    hllFold(s.table(sink)).orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_stream_hll_census" -> (q142StreamHllCensus _),
    "q129_hll_distinct" -> (q129HllDistinct _),
    "q133_cms_heavy_hitters" -> (q133CmsHeavyHitters _),
    "q135_hll_merge" -> (q135HllMerge _),
    "q136_hist_quantiles" -> (q136HistQuantiles _)
  )

  /** Shared oracle CTE text: per-document (source, shard, hm, bucket,
    * rho) — the hllProj twin. Emits CTEs ending in `y`. */
  private def hllProjCtes: String =
    s"""${PortableStringHash.strHashCtes(
           "documents", Seq("doc_id", "source"), "text", "th", "hv")},
        x AS (SELECT doc_id, source,
                     ${PortableHash.mixSql("hv", MixSeed)} AS hm
              FROM th),
        y AS (SELECT source, doc_id % 2 AS shard, hm,
                     hm % $HllM AS bucket, hm // $HllM AS v,
                     CASE WHEN hm // $HllM = 0 THEN $HllScaleBits
                          ELSE $HllScaleBits - length(bin(hm // $HllM)) END AS rho
              FROM x)"""

  /** The d CMS (row, bucket) arms as UNION ALL text over relation
    * `rel`'s hash column `v` — reuses [[PortableHash.mixSql]] verbatim
    * per row seed, so the bucketing replays the Spark side exactly. */
  private def cmsArmsSql(rel: String, extraCols: String): String =
    (0 until CmsD).map { r =>
      s"SELECT $extraCols, $r AS r, ${PortableHash.mixSql("v", CmsSeed + r)} % $CmsW AS bucket FROM $rel"
    }.mkString(" UNION ALL ")

  val oracleSql: Map[String, String] = Map(
    // per-token exact counts feed both the counters (sum of counts per
    // bucket ≡ per-occurrence increments) and the candidate list; the
    // same mixSql text buckets both engines identically
    "q133_cms_heavy_hitters" ->
      s"""WITH otoks AS (SELECT doc_id,
                         unnest(string_split_regex(trim(text), '\\s+')) AS tok
                  FROM documents),
          ftoks AS (SELECT tok, count(*) AS n_exact
                    FROM otoks WHERE len(tok) > 0 GROUP BY tok),
          tc AS (SELECT tok AS tok_key, n_exact, tok FROM ftoks),
          ${PortableStringHash.strHashCtes(
            "tc", Seq("tok_key", "n_exact"), "tok", "h", "v")},
          cms AS (SELECT r, bucket, CAST(sum(n_exact) AS BIGINT) AS cnt
                  FROM (${cmsArmsSql("h", "n_exact")})
                  GROUP BY r, bucket),
          top AS (SELECT tok_key, n_exact, v,
                         row_number() OVER (ORDER BY n_exact DESC, tok_key) AS rk
                  FROM h QUALIFY rk <= $CmsTopK),
          probe AS (${cmsArmsSql("top", "tok_key, n_exact, rk")})
          SELECT p.tok_key AS tok,
                 CAST(p.n_exact AS BIGINT) AS n_exact,
                 CAST(min(c.cnt) AS BIGINT) AS n_cms,
                 CAST(p.rk AS INT) AS rk
          FROM probe p JOIN cms c USING (r, bucket)
          GROUP BY p.tok_key, p.n_exact, p.rk
          ORDER BY rk""",
    // identical register math: same portable hash + mix, same
    // length(bin(v)) rank (both engines' bin is minimal), same
    // integerized harmonic sum and truncating-division estimate
    "q129_hll_distinct" ->
      s"""WITH $hllProjCtes,
          b AS (SELECT source, bucket, max(rho) AS rho
                FROM y GROUP BY source, bucket),
          s AS (SELECT source,
                       CAST(sum(CAST(1 AS BIGINT) << ($HllScaleBits - rho))
                            + ($HllM - count(*)) * ${1L << HllScaleBits}
                            AS BIGINT) AS s_sum,
                       CAST($HllM - count(*) AS BIGINT) AS v_empty
                FROM b GROUP BY source),
          e AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(count(DISTINCT hm) AS BIGINT) AS n_exact
                FROM y GROUP BY source)
          SELECT e.source, e.n_docs, e.n_exact, s.v_empty, s.s_sum,
                 CAST($EstNum // s_sum AS BIGINT) AS est_e6
          FROM e JOIN s USING (source)
          ORDER BY source""",
    // q129's register math verbatim, sketch columns only (a streaming
    // plan cannot also carry the exact countDistinct evidence)
    "q142_stream_hll_census" ->
      s"""WITH $hllProjCtes,
          b AS (SELECT source, bucket, max(rho) AS rho
                FROM y GROUP BY source, bucket),
          s AS (SELECT source,
                       CAST(sum(CAST(1 AS BIGINT) << ($HllScaleBits - rho))
                            + ($HllM - count(*)) * ${1L << HllScaleBits}
                            AS BIGINT) AS s_sum,
                       CAST($HllM - count(*) AS BIGINT) AS v_empty
                FROM b GROUP BY source)
          SELECT source, v_empty, s_sum,
                 CAST($EstNum // s_sum AS BIGINT) AS est_e6
          FROM s ORDER BY source""",
    // both sides of the merge law replayed independently: full-pass
    // registers vs per-shard registers merged by max
    "q135_hll_merge" ->
      s"""WITH $hllProjCtes,
          bf AS (SELECT source, bucket, max(rho) AS rho
                 FROM y GROUP BY source, bucket),
          sf AS (SELECT source,
                        CAST(sum(CAST(1 AS BIGINT) << ($HllScaleBits - rho))
                             + ($HllM - count(*)) * ${1L << HllScaleBits}
                             AS BIGINT) AS s_sum_full
                 FROM bf GROUP BY source),
          bs AS (SELECT source, shard, bucket, max(rho) AS rho
                 FROM y GROUP BY source, shard, bucket),
          bm AS (SELECT source, bucket, max(rho) AS rho
                 FROM bs GROUP BY source, bucket),
          sm AS (SELECT source,
                        CAST(sum(CAST(1 AS BIGINT) << ($HllScaleBits - rho))
                             + ($HllM - count(*)) * ${1L << HllScaleBits}
                             AS BIGINT) AS s_sum_merged
                 FROM bm GROUP BY source),
          ns AS (SELECT source, CAST(count(DISTINCT shard) AS BIGINT) AS n_shards
                 FROM y GROUP BY source)
          SELECT sf.source, ns.n_shards, sf.s_sum_full, sm.s_sum_merged,
                 CAST($EstNum // sf.s_sum_full AS BIGINT) AS est_full,
                 CAST($EstNum // sm.s_sum_merged AS BIGINT) AS est_merged,
                 (sf.s_sum_full = sm.s_sum_merged) AS merge_ok
          FROM sf JOIN sm USING (source) JOIN ns USING (source)
          ORDER BY source""",
    // same cross-multiplied rank rules; bucket hulls are pure bit
    // arithmetic
    "q136_hist_quantiles" ->
      s"""WITH b AS (SELECT source,
                            CASE WHEN n_chars = 0 THEN 0
                                 ELSE length(bin(n_chars)) END AS bucket
                     FROM documents),
          h AS (SELECT source, bucket, count(*) AS cnt
                FROM b GROUP BY 1, 2),
          c AS (SELECT source, bucket, cnt,
                       sum(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
                       sum(cnt) OVER (PARTITION BY source) AS n
                FROM h),
          a AS (SELECT source, n,
                       min(CASE WHEN cum * 2 >= n THEN bucket END) AS p50_bucket,
                       min(CASE WHEN cum * 20 >= n * 19 THEN bucket END) AS p95_bucket
                FROM c GROUP BY 1, 2)
          SELECT source, CAST(n AS BIGINT) AS n_docs,
                 CAST(p50_bucket AS INT) AS p50_bucket,
                 CAST(CASE WHEN p50_bucket = 0 THEN 0
                           ELSE CAST(1 AS BIGINT) << (p50_bucket - 1) END
                      AS BIGINT) AS p50_lo,
                 CAST((CAST(1 AS BIGINT) << p50_bucket) - 1 AS BIGINT) AS p50_hi,
                 CAST(p95_bucket AS INT) AS p95_bucket,
                 CAST(CASE WHEN p95_bucket = 0 THEN 0
                           ELSE CAST(1 AS BIGINT) << (p95_bucket - 1) END
                      AS BIGINT) AS p95_lo,
                 CAST((CAST(1 AS BIGINT) << p95_bucket) - 1 AS BIGINT) AS p95_hi
          FROM a ORDER BY source"""
  )
}
