package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Corpus-curation operators beyond the q55/q57/q67 sampling/top-k
  * shapes: the Gopher-style quality-filter CASCADE with per-rule
  * attribution, and corpus-level token-frequency statistics (the
  * vocabulary/top-k profile every tokenizer-training and
  * corpus-analysis run computes).
  */
object Curation {

  private val MinTokens = 50L
  private val WordLenLo = 3.0
  private val WordLenHi = 12.0
  private val MinStopRatio = 0.03
  private val MaxPunctRatio = 0.2

  /** Quality-filter cascade with attribution (q80): the Gopher-rule
    * document filter shape — minimum length, mean-word-length band,
    * stopword floor, punctuation ceiling — evaluated TOGETHER so every
    * document carries each rule's verdict, the failure count, and a
    * reasons string. Real pipelines keep this attribution (you audit
    * WHY a document was dropped and tune thresholds from the marginal
    * distributions, not just the keep bit).
    *
    * Scale shape: scan → one codegen'd projection — exchange-free up to
    * the trailing presentation orderBy (a driver-contract determinism
    * sort a production pipeline drops). All four signals come from the
    * same token array / length arithmetic, evaluated once per row;
    * comparisons of identically-computed IEEE doubles are
    * engine-portable.
    */
  def q80QualityGate(s: SparkSession, dir: String): DataFrame =
    qualityCascade(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** The cascade as a pure projection over any (doc_id, text) frame —
    * STATELESS, so the identical Column tree serves the batch gate
    * (q80) and the streaming gate (q92) unchanged: the batch/stream
    * parity argument is structural, not re-implemented.
    */
  private[queries] def qualityCascade(docs: DataFrame): DataFrame = {
    val nTok = tokenCount(col("text"))
    val passLen = nTok >= MinTokens
    val passWord = avgWordLen(col("text")).between(WordLenLo, WordLenHi)
    val passStop = stopwordRatio(col("text")) >= MinStopRatio
    val passPunct = punctRatio(col("text")) <= MaxPunctRatio
    docs
      .select(col("doc_id"), nTok.as("n_tokens"),
        passLen.as("pass_len"), passWord.as("pass_wordlen"),
        passStop.as("pass_stop"), passPunct.as("pass_punct"))
      .withColumn("n_failed",
        (lit(4) - col("pass_len").cast("int") - col("pass_wordlen").cast("int")
          - col("pass_stop").cast("int") - col("pass_punct").cast("int")).cast("long"))
      .withColumn("keep", col("n_failed") === 0)
      .withColumn("reasons", concat_ws(",",
        when(!col("pass_len"), "len"), when(!col("pass_wordlen"), "wordlen"),
        when(!col("pass_stop"), "stop"), when(!col("pass_punct"), "punct")))
  }

  private val TopK = 50

  /** Corpus token frequency top-k (q81): global term counts + document
    * frequencies over the whitespace tokenization, top [[TopK]] terms by
    * (count desc, term asc) — the corpus-vocabulary profile.
    *
    * Scale shape: explode → TWO-exchange distinct aggregation — exact
    * countDistinct plans a partial aggregate on (term, doc_id) BEFORE
    * the first exchange (each task dedupes its own (term, doc) pairs,
    * so the Zipf head never ships one row per occurrence), a second
    * map-side-combined aggregate on the term alone, then top-k as
    * TakeOrderedAndProject (no global sort; each partition forwards at
    * most K rows). The first shuffle's keyspace is Σ distinct terms per
    * document — corpus-scale, the honest cost of an EXACT df; swap in
    * approx_count_distinct to collapse to one vocabulary-sized exchange
    * when ±2% df is acceptable.
    */
  def q81TokenTopk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(TopK)

  /** Corpus report with ROLLUP (q85): per-(source, lang) doc counts,
    * token totals and char extremes, with the per-source and
    * grand-total superaggregate rows from one ROLLUP pass — the
    * corpus-composition panel every training-data run reports, and the
    * grouping-sets family SURVEY §2.4 notes the reference lacks but
    * Spark gives free (here: proven against DuckDB's ROLLUP, including
    * the GROUPING_ID bitmask contract).
    *
    * Scale shape: ONE aggregation pass — Expand emits the three
    * grouping-set rows per input row BUT the partial (map-side) hash
    * aggregate collapses them before the single exchange, whose
    * keyspace is |sources|×|langs| + |sources| + 1.
    */
  def q85CorpusRollup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), tokenCount(col("text")).as("n_tok"),
        length(col("text")).cast("long").as("len"))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
        min(col("len")).as("min_chars"), max(col("len")).as("max_chars"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("source").asc_nulls_first, col("lang").asc_nulls_first)

  /** ANN recall evaluation (q86): recall@5 of the IVF index (q36)
    * against the exact top-k baseline (q28), per query and joinable to
    * a macro mean — the MEASURED quality loop every ANN deployment
    * runs ("measure, don't guess" applied to the index itself: the
    * sub-quadratic path's accuracy is a number on the gate, not a
    * claim). Left-semi join of exact pairs against ANN pairs, then a
    * per-query count — both sides are top-k-bounded (|queries|×k rows),
    * so the evaluation costs nothing at any corpus scale.
    */
  def q86AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = DedupSim.q28CosineTopK(s, dir)
      .select(col("qid"), col("neighbor_id"))
    val ann = DedupSim.q36AnnIvf(s, dir)
      .select(col("qid"), col("neighbor_id"))
    val hits = exact.join(ann, Seq("qid", "neighbor_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / 5.0).as("recall_at_5"))
      .orderBy(col("qid"))
  }

  /** ANN index leaderboard (q95): recall@5 of EVERY gated top-k index —
    * IVF (q36), two-stage PQ (q87), IVF-PQ (q94) — against the exact
    * q28 baseline, one row per (index, query) plus the per-index macro
    * mean as a ROLLUP-style summary row (qid null). This is q86
    * generalized into the evaluation harness an index deployment
    * actually keeps: one report that says which accuracy each
    * compression/probe trade buys. All sides are top-k-bounded, so the
    * whole evaluation is |indexes|·|queries|·k rows at any corpus
    * scale.
    */
  def q95IndexRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = DedupSim.q28CosineTopK(s, dir)
      .select(col("qid"), col("neighbor_id"))
    val indexes = Seq(
      "ivf" -> DedupSim.q36AnnIvf(s, dir),
      "pq" -> AnnPq.q87AnnPq(s, dir),
      "ivf_pq" -> AnnPq.q94AnnIvfPq(s, dir))
    val perQuery = indexes.map { case (name, df) =>
      val hits = exact.join(df.select(col("qid"), col("neighbor_id")),
          Seq("qid", "neighbor_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      exact.select(col("qid")).distinct()
        .join(hits, Seq("qid"), "left")
        .select(lit(name).as("index_name"), col("qid"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    }.reduce(_ unionByName _)
    val summary = perQuery.groupBy(col("index_name"))
      .agg(sum(col("n_hits")).as("n_hits"))
      .select(col("index_name"), lit(null).cast("long").as("qid"), col("n_hits"))
    perQuery.unionByName(summary)
      .withColumn("recall_at_5", col("n_hits").cast("double")
        / when(col("qid").isNull, 50.0).otherwise(5.0))
      .orderBy(col("index_name"), col("qid").asc_nulls_first)
  }

  private val ShufBucketW = 65536L // bucket = k div W → ≤ P/W ≈ 32768 buckets
  private val ShardSize = 100L

  /** Deterministic corpus shuffle with contiguous training order (q100):
    * the "shuffle the corpus before training" step — every document gets
    * a pseudorandom but fully reproducible position 0..n-1 (rank of its
    * salted portable hash) and a training shard id (`ord div
    * ShardSize`). Re-salting re-draws the order deterministically;
    * retries and backfills reproduce it exactly (hash, not RNG).
    *
    * Scale shape: the naive formulation (row_number over a GLOBAL
    * window) funnels the corpus through one task. This is the two-phase
    * distributed ranking instead: (1) fixed-width hash-range buckets
    * (`k div ShufBucketW` — deterministic, no sampled boundaries),
    * (2) one linear count-per-bucket aggregate whose collect is bounded
    * by the BUCKET COUNT (≤32768 rows) never the corpus, prefix-summed
    * into offsets on the driver, (3) per-bucket row_number + offset —
    * windows partitioned by bucket, skew-free because the hash is
    * uniform. Two linear shuffles total, nothing global.
    */
  def q100CorpusShuffle(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableStringHash.strHash
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        strHash(concat(lit("shuf:v1|"), col("doc_id").cast("string"))).as("k"))
      .withColumn("bucket", expr(s"k div $ShufBucketW"))
    val counts = docs.groupBy(col("bucket")).count()
      .orderBy(col("bucket")).collect() // bounded by bucket count (≤32768)
    var acc = 0L
    val offs = counts.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq
    import s.implicits._
    val offDf = offs.toDF("bucket", "off")
    val w = Window.partitionBy(col("bucket")).orderBy(col("k"), col("doc_id"))
    docs.join(broadcast(offDf), Seq("bucket"))
      .withColumn("ord", row_number().over(w).cast("long") + col("off") - 1)
      .select(col("doc_id"), col("k"), col("ord"),
        expr(s"ord div $ShardSize").as("shard"))
      .orderBy(col("ord"))
  }

  /** Duplicate-provenance matrix (q107): for every pair of sources, how
    * many duplicate document pairs straddle them — the data-governance
    * report behind "which feeds are re-serving each other's content"
    * (mirror detection, license laundering, scraper loops). The
    * duplicate key is the BAG-OF-WORDS fingerprint — md5 of the sorted
    * distinct token set — so word-order-shuffled mirrors collapse too
    * (this corpus has zero byte-identical texts but 21 token-set
    * duplicate groups; a raw-md5 key would report an empty matrix).
    * Same-source pairs count C(n,2) within a duplicate group,
    * cross-source pairs n_a·n_b; only contributing groups/pairs emit.
    *
    * Scale shape: ONE (fingerprint, source) hash aggregate (linear,
    * map-side combined — the corpus text never shuffles, only 16-byte
    * hashes), then a self-join keyed on the fingerprint whose output is
    * bounded by Σ_group (distinct sources in group)² —
    * duplicate-group-sized, not corpus-sized — and a source²-bounded
    * final aggregate. The pair counts are pure arithmetic on group
    * counts: the quadratic "all duplicate pairs" set is never
    * materialized.
    */
  def q107DupProvenance(s: SparkSession, dir: String): DataFrame = {
    val fp = md5(concat_ws(" ",
      array_sort(array_distinct(tokens(col("text"))))).cast("binary"))
    val g = Tables.documents(s, dir)
      .groupBy(fp.as("h"), col("source"))
      .agg(count(lit(1)).as("n"))
    g.select(col("h"), col("source").as("source_a"), col("n").as("n_a"))
      .join(g.select(col("h"), col("source").as("source_b"), col("n").as("n_b")),
        Seq("h"))
      .filter(col("source_a") <= col("source_b"))
      .withColumn("n_pairs",
        when(col("source_a") === col("source_b"),
          expr("n_a * (n_a - 1) div 2")).otherwise(col("n_a") * col("n_b")))
      .filter(col("n_pairs") > 0)
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_pairs")).as("n_dup_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Per-source length percentiles (q108): exact p50/p90/p99 of document
    * length per source — the corpus-profile report behind truncation and
    * chunk-size decisions. Computed by the HISTOGRAM method, not a
    * rank window: percentiles over an integer domain need only the
    * per-(source, value) counts, so the corpus collapses in ONE linear
    * map-side-combined aggregate and the cumulative walk runs over the
    * value domain (distinct lengths per source — thousands, not the
    * corpus). A row_number-per-source formulation would chain each
    * source's whole mass through one sort; this never materializes
    * per-document rank at all. p-th percentile = smallest value whose
    * cumulative count reaches ceil(p·n) (SQL-standard percentile_disc),
    * with ceil(p·n) written IDENTICALLY on both engines so the IEEE
    * product is bit-equal.
    */
  def q108LengthPercentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Tables.documents(s, dir)
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum(col("cnt")).over(w))
    val tot = h.groupBy(col("source")).agg(sum(col("cnt")).as("n_docs"))
    def pick(p: Double) =
      min(when(col("cum") >= ceil(lit(p) * col("n_docs")), col("n_chars")))
    cum.join(tot, Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"))
  }

  /** Per-source token-distribution divergence (q109): KL(source ‖
    * corpus) over the unigram distributions — the mixture-drift monitor
    * a corpus assembly runs per feed (a source whose language model
    * diverges from the pool is mislabeled, degraded, or spam). Every
    * per-term contribution p·ln(p/q) is computed by the IDENTICAL IEEE
    * expression on both engines, then fixed-point rounded to 10⁻¹² and
    * summed as LONGS — the q58 exact-long trick — so the vocabulary sum
    * is association-order-free and bit-equal no matter how either
    * engine parallelizes the aggregate.
    *
    * Scale shape: one (source, token) count aggregate (linear,
    * map-side combined), one token-keyed corpus-count aggregate joined
    * back (vocabulary-keyed — AQE broadcasts it), per-source totals as
    * a window over the source key, and ONE per-source sum. Nothing
    * quadratic, no driver state.
    */
  def q109SourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c_st"))
    val corpus = st.groupBy(col("t")).agg(sum(col("c_st")).as("c_t"))
    val totS = st.groupBy(col("source")).agg(sum(col("c_st")).as("t_s"))
    val tot = corpus.agg(sum(col("c_t")).as("t_all"))
    val p = col("c_st").cast("double") / col("t_s").cast("double")
    val q = col("c_t").cast("double") / col("t_all").cast("double")
    st.join(corpus, Seq("t"))
      .join(totS, Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("term_fp", round(p * log(p / q) * 1e12).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"), max(col("t_s")).as("n_tokens"),
        round(sum(col("term_fp")).cast("double") / 1e12, 6).as("kl"))
      .orderBy(col("source"))
  }

  private val BudgetTok = 800L // per-source token quota

  /** Budget-capped quality curation (q115): fill each source's fixed
    * token quota with its best documents — rank by quality (ties by
    * doc_id), admit documents while the RUNNING token total stays
    * within [[BudgetTok]], skip any document that would overflow, and
    * keep admitting smaller ones (first-fit by rank, the shape a
    * token-budgeted mixture build actually uses: "give me the best N
    * tokens per source", not "the best N documents").
    *
    * Scale shape: the first-fit recurrence looks sequential per
    * source, but it does NOT need the whole source in one task's
    * memory (a CommonCrawl-shaped mixture is 80%+ one source — any
    * per-source `collect_list` is billions of structs in one buffer
    * at 100 TB). Two observations make it distributed:
    *
    *   1. **No-skip prefix**: while the RAW running token sum stays
    *      ≤ budget, no document has been skipped, so first-fit admits
    *      exactly that prefix — one per-source window cumsum, fully
    *      distributed (phase 1).
    *   2. **Capacity-monotone refinement**: remaining capacity only
    *      shrinks, so any later candidate with `n_tok > rem` is
    *      skipped PERMANENTLY and can be dropped by a distributed
    *      filter. Among the survivors (all individually fit), the
    *      prefix whose cumsum fits is admitted verbatim — first-fit
    *      never skips inside it. Repeat. Each pass admits ≥1 doc per
    *      still-active source (the head survivor always fits), so
    *      passes ≤ per-source budget in tokens and in practice O(log):
    *      the boundary region shrinks geometrically. Driver state per
    *      pass is one count; per-task state is one window partition
    *      slice, never a whole source.
    *
    * Task MEMORY is bounded in both phases: ranking/cumsum are window
    * sorts (ExternalSorter spills), never aggregation buffers. A 90%
    * single-source corpus therefore cannot OOM a task (ScaleStress
    * `q115_skew` row: ×10 with 90% one source, ratio 1.8). Throughput
    * under extreme skew (one source = one window partition's sort) has
    * a further known path — q100's bounded-bucket offset composition
    * (rank = per-bucket offset + within-bucket row_number) applied per
    * source on quality-range sub-buckets — not needed at gate scale.
    */
  def q115TokenBudget(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), tokenCount(col("text")).as("n_tok"),
        qualityScore(col("text")).as("quality"))
      .withColumn("rank_in_source", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id").asc)))
    val wCum = Window.partitionBy(col("source")).orderBy(col("rank_in_source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phase 1: the no-skip prefix — raw running sum ≤ budget ⟹ admitted
    val base = ranked.withColumn("cum", sum(col("n_tok")).over(wCum))
    var admitted = base.filter(col("cum") <= BudgetTok)
      .select(col("source"), col("doc_id"), col("n_tok")).localCheckpoint(true)
    var cand = base.filter(col("cum") > BudgetTok)
      .select(col("source"), col("rank_in_source"), col("doc_id"), col("n_tok"))
      .localCheckpoint(true)
    // phase 2: bounded-pass boundary refinement (observation 2 above)
    while (!cand.isEmpty) {
      // used-tokens per source is one row per source — broadcast side
      val cap = admitted.groupBy(col("source")).agg(sum(col("n_tok")).as("used"))
      val c = cand.join(broadcast(cap), Seq("source"), "left")
        .withColumn("rem", lit(BudgetTok) - coalesce(col("used"), lit(0L)))
        .filter(col("n_tok") <= col("rem")) // n_tok > rem: skipped forever
        .withColumn("cum", sum(col("n_tok")).over(wCum))
        .localCheckpoint(true)
      admitted = admitted.union(
        c.filter(col("cum") <= col("rem"))
          .select(col("source"), col("doc_id"), col("n_tok"))).localCheckpoint(true)
      cand = c.filter(col("cum") > col("rem"))
        .select(col("source"), col("rank_in_source"), col("doc_id"), col("n_tok"))
        .localCheckpoint(true)
    }
    ranked.join(admitted.select(col("source"), col("doc_id")), Seq("source", "doc_id"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        round(col("quality"), 6).as("quality"), col("rank_in_source"))
      .orderBy(col("doc_id"))
  }

  private val DsirB = 1024L
  private val DsirK = 100

  /** DSIR-style importance weighting (q121): hashed-n-gram importance
    * resampling toward a target domain (Xie et al. 2023,
    * arXiv:2302.03169 — the data-selection shape behind domain-matched
    * pretraining mixtures). Features are unigrams AND bigrams hashed
    * into [[DsirB]] buckets (the paper's hashed n-gram feature space);
    * the target distribution is the English slice (`lang = 'en'` — the
    * canonical "select docs like my target corpus" use), the raw
    * distribution is the whole corpus; every document scores
    * Σ_features [ln p̂_tgt(b) − ln p̂_raw(b)] with add-one smoothing,
    * and the top [[DsirK]] by weight are marked selected (the
    * deterministic variant of the paper's Gumbel resampling).
    *
    * Determinism contract: each bucket's log-ratio is fixed-pointed
    * ONCE (⌊lr·10⁹+½⌋ — floor, not round, q65's discipline, because lr
    * is signed and decimal-round half-way modes differ across engines),
    * then per-doc weights are exact BIGINT sums of those fixed points —
    * association-order-free, so the hashed output carries no
    * accumulated float. Scale shape: feature extraction is linear scan
    * work — uni+bigrams emitted from ONE array concat per document and
    * the target flag carried FROM THE SAME SCAN (`lang` rides the
    * projection; attaching it later as a doc_id join would shuffle the
    * token-level feature stream, measured 2× the whole query at ×100) —
    * the bucket table is ≤[[DsirB]] rows (broadcast), totals one
    * row, the per-doc aggregate linear, and selection is a distributed
    * top-K (TakeOrdered), never a global sort. Feature extraction runs
    * once per consuming aggregate (the bucket census, then the per-doc
    * fold) — the inherent two passes of importance weighting.
    */
  def q121DsirWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableStringHash.strHash
    // spreadDocs A/B-measured FLAT here (r14: 2.26 vs 2.21 s — the
    // per-pass n-gram CPU is small and ~13 stages of fixed cost
    // dominate), so the scan keeps its own layout
    val t0 = Tables.documents(s, dir)
      .select(col("doc_id"), (col("lang") === "en").as("is_t"),
        expr("filter(split(trim(text), '\\\\s+'), x -> length(x) > 0)").as("t"))
    val uni = t0.select(col("doc_id"), col("is_t"), explode(col("t")).as("f"))
    val bi = t0.select(col("doc_id"), col("is_t"),
      explode(expr("transform(slice(t, 1, greatest(size(t) - 1, 0)), " +
        "(x, i) -> concat(x, ' ', element_at(t, i + 2)))")).as("f"))
    val feats = uni.unionByName(bi)
      .select(col("doc_id"), col("is_t"),
        pmod(strHash(col("f")), lit(DsirB)).as("b"))
    val bs = feats
      .groupBy(col("b"))
      .agg(count(lit(1)).as("raw_c"), count(when(col("is_t"), 1)).as("tgt_c"))
    val tot = bs.agg(sum(col("raw_c")).as("rr"), sum(col("tgt_c")).as("tt"))
    val lr = bs.crossJoin(broadcast(tot))
      .select(col("b"),
        floor((log((col("tgt_c") + lit(1.0)) / (col("tt") + lit(DsirB.toDouble)))
          - log((col("raw_c") + lit(1.0)) / (col("rr") + lit(DsirB.toDouble))))
          * lit(1e9) + lit(0.5)).cast("long").as("lr_fp"))
    val dw = feats.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr_fp")).as("logw_fp"))
    val full = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .join(dw, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("lang"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw_fp"), lit(0L)).as("logw_fp"))
    val sel = full.orderBy(col("logw_fp").desc, col("doc_id")).limit(DsirK)
      .select(col("doc_id"), lit(true).as("sel"))
    full.join(broadcast(sel), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_feats"), col("logw_fp"),
        coalesce(col("sel"), lit(false)).as("selected"))
      .orderBy(col("doc_id"))
  }

  private val EpochMult = 2L     // materialized size = EpochMult × corpus
  private val EpochBuckets = 1024L // hash-bucket width for the de-skewed rank

  /** q170: EPOCH-AWARE MIXTURE MATERIALIZATION — the upsampling half of
    * the mixture story (q55/q122 sample DOWN; real pretraining mixes
    * REPEAT high-quality slices for fractional epochs — "books ×3.5,
    * crawl ×0.9"). Per language, the α=½-tempered share of an
    * [[EpochMult]]× token budget fixes an exact integer quota; every
    * doc repeats ⌊quota/n⌋ times and the quota-mod-n FRACTIONAL epoch
    * goes to the docs with the smallest deterministic per-doc hash
    * (MINSTD over doc_id — reproducible, coordination-free); the output
    * is the epoch-expanded corpus, one row per (doc, epoch), quotas hit
    * EXACTLY by construction. A quota below n downsamples the same way
    * (reps 0 drops the doc) — one rule covers both directions.
    *
    * Scale shape (the q115 de-skew discipline, applied to rank
    * selection): the fractional-epoch set is "the fn smallest (h,
    * doc_id) per language", but a naive per-language row_number funnels
    * each language through ONE task. Instead h is split into
    * [[EpochBuckets]] ordered buckets; per-(lang, bucket) counts
    * cumulate on a language×buckets frame (driver-tiny, broadcast), all
    * buckets strictly below the threshold bucket are extras wholesale,
    * and ONLY the boundary bucket (≈ n/buckets docs) pays a rank
    * window. Because the bucket id is h div W — monotone in h — the
    * bucketed selection is PROVABLY the global fn-smallest set, which
    * is exactly what the declarative oracle replays with one
    * row_number. Weights are q122's exact ⌊√n·10⁶+½⌋ fixed points
    * (IEEE sqrt is correctly rounded); everything after is BIGINT.
    */
  def q170EpochMixture(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source"))
    val cnt = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val w = cnt.select(col("lang"), col("n"),
      floor(sqrt(col("n").cast("double")) * lit(1e6) + lit(0.5)).cast("long").as("w"))
    val tot = w.agg(sum(col("w")).as("tw"), sum(col("n")).as("tn"))
    val q = w.crossJoin(broadcast(tot))
      .select(col("lang"), col("n"),
        expr(s"(w * $EpochMult * tn) div tw").as("quota"))
    val bw = (2147483647L / EpochBuckets) + 1
    // dd feeds the census, the boundary window and both sides of the
    // final join — one persist barrier (q149's discipline)
    val dd = d.join(broadcast(q), Seq("lang"))
      .withColumn("h", pmod(col("doc_id") * lit(48271L), lit(2147483647L)))
      .withColumn("bk", expr(s"h div $bw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // language×bucket census → cumulative threshold (tiny frame)
    val cum = dd.groupBy(col("lang"), col("bk")).agg(count(lit(1)).as("c"))
      .withColumn("cum_before",
        coalesce(sum(col("c")).over(Window.partitionBy(col("lang"))
          .orderBy(col("bk")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val bstar = cum.join(q.select(col("lang"), expr("quota % n").as("fn")), Seq("lang"))
      .filter(col("fn") > 0 && col("cum_before") < col("fn") &&
        col("cum_before") + col("c") >= col("fn"))
      .select(col("lang"), col("bk").as("bstar"),
        (col("fn") - col("cum_before")).as("k"))
    val withB = dd.join(broadcast(bstar), Seq("lang"), "left")
    // only the boundary bucket pays a rank window — ≈ n/EpochBuckets rows
    val boundaryRk = withB.filter(col("bk") === col("bstar"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      .select(col("doc_id"), (col("rk") <= col("k")).as("extra_b"))
    withB.join(boundaryRk, Seq("doc_id"), "left")
      .withColumn("extra",
        when(col("bstar").isNull, lit(false))
          .when(col("bk") < col("bstar"), lit(true))
          .otherwise(coalesce(col("extra_b"), lit(false))))
      .withColumn("reps", expr("quota div n") + col("extra").cast("long"))
      .select(col("doc_id"), col("lang"), col("source"), col("n").as("n_lang"),
        col("quota"), col("reps"),
        explode(when(col("reps") > 0, sequence(lit(0L), col("reps") - 1))
          .otherwise(array().cast("array<long>"))).as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  private val MixAlphaBudget = 200L // sampled docs across the corpus

  /** Temperature-balanced mixture sampling (q122): the α-scaled
    * language-rebalancing trick multilingual pretraining uses (mT5 /
    * XLM-R: sample languages ∝ n^α with α≈0.5 so high-resource
    * languages stop drowning the tail). Per language, the acceptance
    * rate is `min(1, n^α·M / (Σ_l n_l^α · n))` for a corpus budget of
    * [[MixAlphaBudget]] docs; membership is decided by a deterministic
    * portable hash threshold (the q55 convention — reproducible,
    * coordination-free, executor-local).
    *
    * Determinism contract: IEEE sqrt is CORRECTLY ROUNDED (unlike ln),
    * so `w_fp = ⌊√n·10⁶+½⌋` is engine-identical; every later step —
    * Σ w_fp, the rate `⌊w_fp·M·10⁶ / (tot·n)⌋`, the hash compare — is
    * exact BIGINT arithmetic. No float survives to the hashed output.
    * (Long bound: w_fp·M·10⁶ < 2⁶³ up to ~2·10⁹ docs per language at
    * this budget scale.) Scale shape: one language-count aggregate
    * (bounded rows, driver-computed exact rates), one broadcast join,
    * a codegen hash compare per row — zero extra exchanges.
    */
  def q122TempMixture(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{PortableHash, PortableStringHash}
    import PortableStringHash.strHash
    import s.implicits._
    val counts = Tables.documents(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).orderBy(col("lang"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val wfp = counts.map { case (l, n) =>
      (l, n, math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong)
    }
    val tot = wfp.map(_._3).sum
    val rates = wfp.map { case (l, n, w) =>
      (l, n, math.min(1000000L, w * MixAlphaBudget * 1000000L / (tot * n)))
    }.toSeq.toDF("lang", "n_lang", "r_fp")
    Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source"))
      .join(broadcast(rates), Seq("lang"))
      // mix after the string hash: a short numeric suffix only moves the
      // polynomial through a NARROW band of [0, P) (width ≈ 131³·chars),
      // so a 10⁶ modulus on the raw hash is badly lumpy (measured 6/500
      // accepts at a 40% target); the M1-multiply bijection spreads the
      // band across [0, P) first — q55's 10⁴ modulus wraps the band
      // hundreds of times and never saw this
      .withColumn("h", pmod(
        PortableHash.mix(
          strHash(concat(lit("mix:v1|"), col("doc_id").cast("string"))), 7),
        lit(1000000L)))
      .select(col("doc_id"), col("lang"), col("source"), col("n_lang"),
        col("r_fp"), (col("h") < col("r_fp")).as("accepted"))
      .orderBy(col("doc_id"))
  }

  /** q140: PARTITIONED CORPUS EXPORT — the sink step every curation
    * pipeline ends with: the q127-passing documents written as a
    * Hive-partitioned parquet corpus (`source=<name>/part-*.parquet`)
    * and read BACK through the partition-discovery path, so the gate
    * hashes the full write→discover→read round trip (partition values
    * reconstructed from directory names, not data pages).
    *
    * Sink shape for 100 TB: `partitionBy` on a LOW-cardinality column
    * (sources are tens — per-task open-file count stays bounded; a
    * high-cardinality partition key would be a small-files explosion)
    * plus `maxRecordsPerFile` to cap file size regardless of task
    * sizing. Downstream, source-filtered reads prune whole directories
    * (partition pruning needs no footer reads).
    */
  /** The q140 export root: scoped by a fingerprint of `dir` (content
    * differs per scale factor) AND the JVM pid — concurrent JVMs
    * (sbt test + driver Verify, the stageWithSentinel race) must never
    * overwrite a directory the other is lazily reading back. Shared
    * with the spec so the layout assertions can't drift from the
    * query's path scheme. */
  private[graft] def q140ExportPath(dir: String): String = {
    val dirTag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    BinaryGate.fixtureDir("q140") +
      s"/corpus-$dirTag-${ProcessHandle.current().pid()}"
  }

  def q140PartitionedExport(s: SparkSession, dir: String): DataFrame = {
    val out = q140ExportPath(dir)
    // OBSERVE BARRIER (r13; previously a persist, 15 s → 2.6 s): without
    // a barrier `filter(pass)` pushes beneath q127's projection and alias
    // substitution inlines the whole six-rule conjunction — including
    // both trigram HOF chains — into the filter, re-evaluating the
    // heavy expressions many times per row (the projection then pays
    // them again). PushPredicateThroughNonJoin does not cross
    // CollectMetrics, so the cascade stays a single codegen'd projection
    // and the filter reads the `pass` column — same one-evaluation shape
    // as the persist, without paying cache write+read for rows used once
    // (measured: the scored noop 13.4 s → 0.9 s; also the barrier q147's
    // STREAM uses, where persist is not available).
    // gopherRulesOf directly (not q127GopherRules): q127's presentation
    // orderBy would be a wasted range exchange under the export join
    val rules = TextAnalytics.gopherRulesOf(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .observe("q140_scored", count(lit(1)).as("n_scored"))
    val export = rules
      .filter(col("pass"))
      .select(col("doc_id"), col("n_words"), col("g3_distinct"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
    // repartition on the partition key first: each task then writes
    // exactly ONE partition directory (20 files total), instead of
    // every task opening a writer per source it happens to hold —
    // the tasks × partitions small-files explosion this sink exists
    // to demonstrate avoiding (measured: 14.7 s → ~1 s at sf0.1)
    export.repartition(col("source"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 100000)
      .partitionBy("source")
      .parquet(out)
    // explicit schema: a zero-pass corpus writes no part files, and
    // schema inference over an empty dir would throw instead of
    // returning the (correct) empty frame
    s.read.schema(export.schema).parquet(out)
      .select(col("doc_id"), col("n_words"), col("g3_distinct"), col("source"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_partitioned_export" -> (q140PartitionedExport _),
    "q122_temp_mixture" -> (q122TempMixture _),
    "q170_epoch_mixture" -> (q170EpochMixture _),
    "q121_dsir_weights" -> (q121DsirWeights _),
    "q115_token_budget" -> (q115TokenBudget _),
    "q108_length_percentiles" -> (q108LengthPercentiles _),
    "q109_source_divergence" -> (q109SourceDivergence _),
    "q107_dup_provenance" -> (q107DupProvenance _),
    "q100_corpus_shuffle" -> (q100CorpusShuffle _),
    "q80_quality_gate" -> (q80QualityGate _),
    "q81_token_topk" -> (q81TokenTopk _),
    "q85_corpus_rollup" -> (q85CorpusRollup _),
    "q86_ann_recall" -> (q86AnnRecall _),
    "q95_index_recall" -> (q95IndexRecall _),
  )

  private val enList = sqlList(EnStop)

  /** q121 oracle: the same hashed-n-gram DSIR pipeline — position-keyed
    * portable hashes keep feature MULTIPLICITY (strHashCtes groups by
    * its keys, so (doc_id, pos) must be in them), bucket log-ratios are
    * fixed-pointed once, doc weights are exact BIGINT sums.
    */
  private def dsirSql: String = {
    val hashCtes = graft.functions.PortableStringHash.strHashCtes(
      "fall", Seq("doc_id", "pos"), "f", "fh", "v")
    s"""WITH t0 AS (SELECT doc_id,
                    list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> len(x) > 0) AS t
                    FROM documents),
       uni AS (SELECT doc_id, unnest(t) AS f, generate_subscripts(t, 1) AS pos
               FROM t0),
       bil AS (SELECT doc_id,
                      list_transform(list_slice(t, 1, greatest(len(t) - 1, 0)),
                                     (x, i) -> x || ' ' || t[i + 1]) AS bl
               FROM t0),
       bi AS (SELECT doc_id, unnest(bl) AS f,
                     generate_subscripts(bl, 1) + 1000000 AS pos
              FROM bil),
       fall AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
       $hashCtes,
       feats AS (SELECT doc_id, v % $DsirB AS b FROM fh),
       tgt AS (SELECT doc_id, lang = 'en' AS is_t FROM documents),
       bs AS (SELECT b, CAST(count(*) AS BIGINT) AS raw_c,
                     CAST(count(*) FILTER (WHERE is_t) AS BIGINT) AS tgt_c
              FROM feats JOIN tgt USING (doc_id) GROUP BY 1),
       tot AS (SELECT sum(raw_c) AS rr, sum(tgt_c) AS tt FROM bs),
       lr AS (SELECT b,
                     CAST(floor((ln((tgt_c + 1.0) / (tt + $DsirB.0))
                                 - ln((raw_c + 1.0) / (rr + $DsirB.0)))
                                * 1e9 + 0.5) AS BIGINT) AS lr_fp
              FROM bs CROSS JOIN tot),
       dw AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                     CAST(sum(l.lr_fp) AS BIGINT) AS logw_fp
              FROM feats f JOIN lr l USING (b) GROUP BY 1),
       fullr AS (SELECT d.doc_id, d.source, d.lang,
                       coalesce(w.n_feats, 0) AS n_feats,
                       coalesce(w.logw_fp, 0) AS logw_fp
                 FROM documents d LEFT JOIN dw w USING (doc_id)),
       sel AS (SELECT doc_id FROM fullr ORDER BY logw_fp DESC, doc_id LIMIT $DsirK)
       SELECT f.doc_id, f.source, f.lang, f.n_feats, f.logw_fp,
              s.doc_id IS NOT NULL AS selected
       FROM fullr f LEFT JOIN sel s USING (doc_id)
       ORDER BY f.doc_id"""
  }

  /** q122 oracle: the same exact-integer rate pipeline; only sqrt is
    * floating, and IEEE sqrt is correctly rounded on both engines.
    */
  private def tempMixtureSql: String = {
    val hashCtes = graft.functions.PortableStringHash.strHashCtes(
      "k", Seq("doc_id"), "f", "kh", "v")
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
                 FROM documents GROUP BY 1),
       w AS (SELECT lang, n_lang,
                    CAST(floor(sqrt(CAST(n_lang AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                      AS w_fp
             FROM c),
       t AS (SELECT CAST(sum(w_fp) AS BIGINT) AS tot FROM w),
       r AS (SELECT lang, n_lang,
                    CAST(least(1000000,
                          (w_fp * $MixAlphaBudget * 1000000)
                            // (tot * n_lang)) AS BIGINT) AS r_fp
             FROM w CROSS JOIN t),
       k AS (SELECT doc_id, 'mix:v1|' || CAST(doc_id AS VARCHAR) AS f
             FROM documents),
       $hashCtes
       SELECT d.doc_id, d.lang, d.source, r.n_lang, r.r_fp,
              (${graft.functions.PortableHash.mixSql("h.v", 7)} % 1000000)
                < r.r_fp AS accepted
       FROM documents d
       JOIN r USING (lang)
       JOIN kh h USING (doc_id)
       ORDER BY d.doc_id"""
  }

  val oracleSql: Map[String, String] = Map(
    // the q127 rule text verbatim (shared def), pass-filtered and
    // joined back for the partition column — what the export must
    // round-trip exactly
    "q140_partitioned_export" ->
      s"""WITH rules AS (${TextAnalytics.gopherRulesSql})
          SELECT r.doc_id, r.n_words, r.g3_distinct, d.source
          FROM rules r JOIN documents d USING (doc_id)
          WHERE r.pass ORDER BY r.doc_id""",
    "q122_temp_mixture" -> tempMixtureSql,
    // the oracle replays the DECLARATIVE spec — global fn-smallest
    // (h, doc_id) per language — which the engine's bucketed threshold
    // selection provably equals (bucket id is monotone in h)
    "q170_epoch_mixture" ->
      s"""WITH d AS (SELECT doc_id, lang, source FROM documents),
        |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |w AS (SELECT lang, n,
        |             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w
        |      FROM c),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(sum(n) AS BIGINT) AS tn FROM w),
        |q AS (SELECT lang, n, (w * $EpochMult * tn) // tw AS quota FROM w CROSS JOIN t),
        |r AS (SELECT d.doc_id, d.lang, d.source, q.n, q.quota,
        |             row_number() OVER (PARTITION BY d.lang
        |               ORDER BY (d.doc_id * 48271) % 2147483647, d.doc_id) AS rk
        |      FROM d JOIN q USING (lang)),
        |e AS (SELECT doc_id, lang, source, n AS n_lang, quota,
        |             CAST(quota // n
        |               + CASE WHEN rk <= quota % n THEN 1 ELSE 0 END AS BIGINT) AS reps
        |      FROM r)
        |SELECT doc_id, lang, source, n_lang, quota, reps, CAST(u.e AS BIGINT) AS epoch
        |FROM e, unnest(range(reps)) AS u(e)
        |ORDER BY doc_id, epoch""".stripMargin,
    "q121_dsir_weights" -> dsirSql,
    // first-fit admission replayed as a recursive CTE walking each
    // source's rank order with the admitted-token total as state
    "q115_token_budget" ->
      s"""WITH RECURSIVE t AS (
            SELECT doc_id, source, text,
                   string_split_regex(trim(text), '\\s+') AS toks
            FROM documents),
          m AS (SELECT doc_id, source,
                       CAST(len(toks) AS BIGINT) AS n_tok,
                       ${TextAnalytics.qualitySql("text")} AS quality
                FROM t),
          ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
                          ORDER BY quality DESC, doc_id) AS INTEGER)
                          AS rank_in_source
                     FROM m),
          walk AS (
            SELECT source, rank_in_source, doc_id, n_tok, quality,
                   CASE WHEN n_tok <= $BudgetTok THEN n_tok
                        ELSE CAST(0 AS BIGINT) END AS tot,
                   n_tok <= $BudgetTok AS kept
            FROM ranked WHERE rank_in_source = 1
            UNION ALL
            SELECT x.source, x.rank_in_source, x.doc_id, x.n_tok, x.quality,
                   CASE WHEN w.tot + x.n_tok <= $BudgetTok THEN w.tot + x.n_tok
                        ELSE w.tot END,
                   w.tot + x.n_tok <= $BudgetTok
            FROM walk w JOIN ranked x
              ON x.source = w.source AND x.rank_in_source = w.rank_in_source + 1)
          SELECT doc_id, source, n_tok, quality, rank_in_source
          FROM walk WHERE kept ORDER BY doc_id""",
    "q108_length_percentiles" ->
      """WITH h AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt
                    FROM documents GROUP BY 1, 2),
         c AS (SELECT source, n_chars, cnt,
                      CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM h),
         t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs FROM h GROUP BY 1)
         SELECT c.source, max(t.n_docs) AS n_docs,
                min(CASE WHEN cum >= ceil(0.5 * t.n_docs) THEN n_chars END) AS p50,
                min(CASE WHEN cum >= ceil(0.9 * t.n_docs) THEN n_chars END) AS p90,
                min(CASE WHEN cum >= ceil(0.99 * t.n_docs) THEN n_chars END) AS p99,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM c JOIN t USING (source)
         GROUP BY 1 ORDER BY 1""",
    "q109_source_divergence" ->
      """WITH st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c_st
                     FROM (SELECT source,
                                  unnest(string_split_regex(trim(text), '\s+')) AS t
                           FROM documents)
                     WHERE length(t) > 0 GROUP BY 1, 2),
         corpus AS (SELECT t, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
         tots AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1),
         tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_all FROM corpus),
         terms AS (SELECT st.source,
                          CAST(round((CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE))
                               * ln((CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE))
                                    / (CAST(c_t AS DOUBLE) / CAST(t_all AS DOUBLE)))
                               * 1e12) AS BIGINT) AS term_fp,
                          t_s
                   FROM st JOIN corpus USING (t) JOIN tots USING (source) CROSS JOIN tot)
         SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                max(t_s) AS n_tokens,
                round(CAST(sum(term_fp) AS DOUBLE) / 1e12, 6) AS kl
         FROM terms GROUP BY 1 ORDER BY 1""",
    "q107_dup_provenance" ->
      """WITH g AS (SELECT md5(array_to_string(
                             list_sort(list_distinct(
                               string_split_regex(trim(text), '\s+'))), ' ')) AS h,
                           source, CAST(count(*) AS BIGINT) AS n
                    FROM documents GROUP BY 1, 2),
         p AS (SELECT a.source AS source_a, b.source AS source_b,
                      CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
                           ELSE a.n * b.n END AS n_pairs
               FROM g a JOIN g b ON a.h = b.h AND a.source <= b.source)
         SELECT source_a, source_b,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(sum(n_pairs) AS BIGINT) AS n_dup_pairs
         FROM p WHERE n_pairs > 0
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q100_corpus_shuffle" ->
      s"""WITH d AS (SELECT doc_id, 'shuf:v1|' || CAST(doc_id AS VARCHAR) AS tok
        |           FROM documents),
        |${graft.functions.PortableStringHash.strHashCtes(
             "d", Seq("doc_id"), "tok", "kh", "k")}
        |SELECT doc_id, k,
        |       CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS ord,
        |       (CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT))
        |         // $ShardSize AS shard
        |FROM kh ORDER BY ord""".stripMargin,
    "q80_quality_gate" ->
      s"""WITH t AS (SELECT doc_id, text,
        |                  string_split_regex(trim(text), '\\s+') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id,
        |        CAST(len(toks) AS BIGINT) AS n_tokens,
        |        CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) AS awl,
        |        CAST(len(list_filter(toks, x -> list_contains($enList, x))) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) AS stop_ratio,
        |        CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |             AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio
        |      FROM t),
        |f AS (SELECT doc_id, n_tokens,
        |        n_tokens >= $MinTokens AS pass_len,
        |        awl BETWEEN $WordLenLo AND $WordLenHi AS pass_wordlen,
        |        stop_ratio >= $MinStopRatio AS pass_stop,
        |        punct_ratio <= $MaxPunctRatio AS pass_punct
        |      FROM m)
        |SELECT doc_id, n_tokens, pass_len, pass_wordlen, pass_stop, pass_punct,
        |       CAST(4 - CAST(pass_len AS INT) - CAST(pass_wordlen AS INT)
        |            - CAST(pass_stop AS INT) - CAST(pass_punct AS INT) AS BIGINT)
        |         AS n_failed,
        |       pass_len AND pass_wordlen AND pass_stop AND pass_punct AS keep,
        |       concat_ws(',',
        |         CASE WHEN NOT pass_len THEN 'len' END,
        |         CASE WHEN NOT pass_wordlen THEN 'wordlen' END,
        |         CASE WHEN NOT pass_stop THEN 'stop' END,
        |         CASE WHEN NOT pass_punct THEN 'punct' END) AS reasons
        |FROM f ORDER BY doc_id""".stripMargin,

    "q81_token_topk" ->
      s"""WITH t AS (SELECT doc_id,
        |                  unnest(string_split_regex(trim(text), '\\s+')) AS tok
        |           FROM documents)
        |SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS df
        |FROM t GROUP BY 1
        |ORDER BY n DESC, tok ASC LIMIT $TopK""".stripMargin,

    "q85_corpus_rollup" ->
      """WITH d AS (SELECT source, lang,
        |                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |                    AS n_tok,
        |                  CAST(length(text) AS BIGINT) AS len
        |           FROM documents)
        |SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |       min(len) AS min_chars, max(len) AS max_chars,
        |       CAST(grouping_id(source, lang) AS BIGINT) AS gid
        |FROM d GROUP BY ROLLUP (source, lang)
        |ORDER BY gid, source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin,

    /* The q86 oracle composes the q28 and q36 oracles verbatim as CTEs
     * (one definition each — the recall evaluation must grade exactly
     * the gated index against exactly the gated baseline). */
    "q86_ann_recall" ->
      s"""WITH exact AS (${DedupSim.oracleSql("q28_cosine_topk")}),
        |ann AS (${DedupSim.oracleSql("q36_ann_ivf")}),
        |hits AS (SELECT e.qid, count(*) AS n_hits
        |         FROM exact e JOIN ann a
        |           ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
        |         GROUP BY 1)
        |SELECT q.qid, coalesce(h.n_hits, 0) AS n_hits,
        |       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
        |FROM (SELECT DISTINCT qid FROM exact) q
        |LEFT JOIN hits h USING (qid)
        |ORDER BY qid""".stripMargin,

    /* The q95 oracle composes the four gated oracles verbatim (q28
     * exact, q36 IVF, q87 PQ, q94 IVF-PQ) and replays the per-index
     * hit counts + macro summary rows. */
    "q95_index_recall" ->
      s"""WITH exact AS (${DedupSim.oracleSql("q28_cosine_topk")}),
        |eq AS (SELECT DISTINCT qid FROM exact),
        |i_ivf AS (${DedupSim.oracleSql("q36_ann_ivf")}),
        |i_pq AS (${AnnPq.oracleSql("q87_ann_pq")}),
        |i_ivfpq AS (${AnnPq.oracleSql("q94_ann_ivf_pq")}),
        |h_ivf AS (SELECT e.qid, count(*) AS n FROM exact e
        |          JOIN i_ivf a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
        |          GROUP BY 1),
        |h_pq AS (SELECT e.qid, count(*) AS n FROM exact e
        |         JOIN i_pq a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
        |         GROUP BY 1),
        |h_ivfpq AS (SELECT e.qid, count(*) AS n FROM exact e
        |            JOIN i_ivfpq a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
        |            GROUP BY 1),
        |per AS (
        |  SELECT 'ivf' AS index_name, q.qid, coalesce(h.n, 0) AS n_hits
        |  FROM eq q LEFT JOIN h_ivf h USING (qid)
        |  UNION ALL
        |  SELECT 'pq' AS index_name, q.qid, coalesce(h.n, 0) AS n_hits
        |  FROM eq q LEFT JOIN h_pq h USING (qid)
        |  UNION ALL
        |  SELECT 'ivf_pq' AS index_name, q.qid, coalesce(h.n, 0) AS n_hits
        |  FROM eq q LEFT JOIN h_ivfpq h USING (qid)),
        |summ AS (SELECT index_name, CAST(NULL AS BIGINT) AS qid,
        |                CAST(sum(n_hits) AS BIGINT) AS n_hits
        |         FROM per GROUP BY 1)
        |SELECT index_name, qid, n_hits,
        |       CAST(n_hits AS DOUBLE)
        |         / CASE WHEN qid IS NULL THEN 50.0 ELSE 5.0 END AS recall_at_5
        |FROM (SELECT * FROM per UNION ALL SELECT * FROM summ)
        |ORDER BY index_name, qid NULLS FIRST""".stripMargin,
  )
}
