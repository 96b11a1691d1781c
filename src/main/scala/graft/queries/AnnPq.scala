package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Product-quantization ANN with exact re-ranking (q87) — the
  * memory-bound two-stage index that makes billion-vector search
  * feasible: each vector is compressed to [[SubSpaces]] small codes
  * (16 codes of 5 bits here for a 64-float vector — a ~25× compression
  * of the scan payload), queries shortlist [[Shortlist]] candidates by
  * asymmetric-distance computation (ADC: one tiny per-query lookup
  * table of query-subvector × codeword dots, summed per candidate by
  * code id), and ONLY the shortlist's full-precision vectors are read
  * for the exact top-[[TopK]] re-rank — the Faiss refine layout.
  *
  * Scale shape: encoding is ONE kernel pass over the embedding table
  * (broadcast codebook, per-subspace argmin in a tight integer loop —
  * the same array-kernel pattern as q36/q38's centroid assignment, for
  * the same measured reason: a dim-keyed equi-join fans every component
  * row out K× before re-aggregating). The codes table IS the index:
  * M small ints per vector, shuffled nowhere. The ADC stage broadcasts
  * a per-query M×K LUT (5120 longs here) against the codes scan —
  * map-side work with one exchange on (qid, vec_id) whose width is
  * candidates, not components — and the re-rank touches Shortlist
  * full vectors per query, independent of corpus size. Compose with
  * q36's IVF lists (probe restriction before the ADC join) for the full
  * IVF-PQ layout; q86's recall harness grades any of these indexes
  * against the exact q28 baseline (the two-stage form measures 1.0
  * recall@5 on this corpus at sf0.001 — pinned in GateQueriesSpec —
  * where raw single-stage ADC measures ~0.5: the re-rank stage is what
  * turns a coarse 25× compression into a usable index).
  *
  * Determinism across engines: components quantize to integers
  * (`round(x·1e6)` HALF_UP — the q30 convention), so subspace L2
  * distances and LUT dots are EXACT BIGINT arithmetic; ties break to
  * the lowest code id / vector id. The ADC presentation division
  * `round(Σ/1e12, 6)` and the exact re-rank dot `round(Σ x·x, 6)`
  * (the q28 contract) are the only IEEE operations.
  *
  * Training here seeds each subspace codebook with the first [[Codes]]
  * vectors' subvectors (the deterministic stand-in q36 uses for its
  * coarse quantizer; real PQ trains per-subspace k-means offline on a
  * sample — q38 demonstrates exactly that loop distributively, and
  * measured on THIS corpus two Lloyd iterations do not move recall:
  * the synthetic embeddings have no cluster structure to learn).
  */
object AnnPq {

  private val SubSpaces = 16 // M subspaces …
  private val SubDim = 4 // … of 4 dims each (64-dim embeddings)
  private val Codes = 32 // K codewords per subspace
  private val NQueries = 10
  private val Shortlist = 50 // ADC candidates kept per query
  private val TopK = 5

  /** Spark `round(x·1e6)` exactly (Catalyst Round = BigDecimal HALF_UP),
    * so kernel-quantized components match the declarative/oracle form
    * bit-for-bit (Math.round differs on negative .5 halves).
    */
  private def quant(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Codebook as driver arrays — bounded by the quantizer shape
    * (M·K·SubDim = 2048 longs), never the corpus.
    */
  private def codebook(raw: DataFrame): Array[Array[Array[Long]]] = {
    val rows = raw.filter(col("vec_id") < Codes)
      .select(col("vec_id"), col("embedding")).collect()
    val cb = Array.ofDim[Long](SubSpaces, Codes, SubDim)
    rows.foreach { r =>
      val cid = r.getLong(0).toInt
      val emb = r.getSeq[Float](1)
      var d = 0
      while (d < SubSpaces * SubDim) {
        cb(d / SubDim)(cid)(d % SubDim) = quant(emb(d).toDouble)
        d += 1
      }
    }
    cb
  }

  /** The PQ code assignment shared by both index-build kernels: per
    * subspace, the code with the minimum EXACT integer L2 distance to
    * the quantized subvector (lowest cid on ties). Kept in ONE place so
    * the q87 and q94 indexes can never desynchronize.
    */
  private def pqCodesOf(xq: Array[Long], cb: Array[Array[Array[Long]]]): Array[Int] = {
    val out = new Array[Int](SubSpaces)
    var m = 0
    while (m < SubSpaces) {
      val codesM = cb(m)
      var bestCid = -1
      var best = Long.MaxValue
      var c = 0
      while (c < Codes) {
        val cw = codesM(c)
        var d2 = 0L
        var i = 0
        while (i < SubDim) {
          val diff = xq(m * SubDim + i) - cw(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < best) { best = d2; bestCid = c }
        c += 1
      }
      out(m) = bestCid
      m += 1
    }
    out
  }

  /** PQ-encode every vector — one kernel pass, no intermediate rows. */
  private def encode(raw: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]]): DataFrame = {
    val s = raw.sparkSession
    import s.implicits._
    raw.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.flatMap { case (id, emb) =>
          val xq = emb.iterator.map(f => quant(f.toDouble)).toArray
          val codes = pqCodesOf(xq, cb)
          (0 until SubSpaces).iterator.map(m => (id, m.toLong, codes(m).toLong))
        }
      }.toDF("vec_id", "m", "code")
  }

  /** Quantized long form `(id, m, dim, xq)` of the first `maxId`
    * vectors (the whole table when `maxId` is negative).
    */
  private def quantLong(raw: DataFrame, idAs: String, valAs: String,
      maxId: Int): DataFrame = {
    val base = if (maxId >= 0) raw.filter(col("vec_id") < maxId) else raw
    base
      .select(col("vec_id").as(idAs), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col(idAs), col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * 1e6).cast("long").as(valAs))
      .withColumn("m", (col("dim") / SubDim).cast("long"))
  }

  /** Per-query LUT: exact integer dot of each query subvector with each
    * codeword — M·K rows per query, built relationally from the long
    * form (tiny input: NQueries + Codes vectors).
    */
  private def lutOf(raw: DataFrame): DataFrame =
    quantLong(raw, "qid", "qxq", NQueries)
      .join(broadcast(quantLong(raw, "cid", "cq", Codes)), Seq("m", "dim"))
      .groupBy(col("qid"), col("m"), col("cid"))
      .agg(sum(col("qxq") * col("cq")).as("ldot"))

  /** The shared two-stage tail: rank an ADC score frame, keep the
    * [[Shortlist]] best per query, and exact-re-rank ONLY those (the
    * full-precision reads are Shortlist·NQueries pairs, independent of
    * corpus size).
    */
  private def shortlistRerank(raw: DataFrame, adc: DataFrame): DataFrame = {
    val byAdc = Window.partitionBy(col("qid")).orderBy(col("score_adc").desc, col("vec_id"))
    val shortlist = adc.withColumn("srank", row_number().over(byAdc))
      .filter(col("srank") <= Shortlist)
      .select(col("qid"), col("vec_id"), col("score_adc"))
    val e = raw.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("x").cast("double").as("x"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("dim"), col("x").as("qx"))
    val exact = e.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(q), Seq("qid", "dim"))
      .groupBy(col("qid"), col("vec_id"), col("score_adc"))
      .agg(round(sum(col("qx") * col("x")), 6).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    exact.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("rn"), col("vec_id").as("neighbor_id"),
        col("score"), col("score_adc"))
      .orderBy(col("qid"), col("rn"))
  }

  def q87AnnPq(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val bc = s.sparkContext.broadcast(codebook(raw))
    val codes = encode(raw, bc)
    val lut = lutOf(raw)
    // stage 1 — ADC: candidates ranked by the summed LUT entries of
    // their codes; keep the Shortlist best per query
    val adc = codes.join(broadcast(lut),
        codes("m") === lut("m") && codes("code") === lut("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("ldot")).cast("double") / 1e12, 6).as("score_adc"))
    shortlistRerank(raw, adc)
  }

  private val Lists = 16 // IVF coarse lists (q94)
  private val Probes = 2 // lists searched per query (q94)

  /** Full IVF-PQ composition (q94): the q36 coarse-quantizer probe
    * restriction IN FRONT of the q87 PQ-ADC + re-rank — the complete
    * billion-vector index layout (Faiss IndexIVFPQ + refine). Every
    * vector is assigned to the nearest of [[Lists]] coarse centroids by
    * EXACT integer dot (computed inside the same kernel pass that PQ-
    * encodes it — one scan emits list id + M codes); a query searches
    * only its [[Probes]] best lists, ranks those candidates by ADC, and
    * exact-re-ranks the shortlist. At 100 TB the list id is the
    * partition key: the ADC join touches Probes/Lists of the codes
    * table, and nothing else is read at full precision but the
    * shortlist.
    *
    * Fully integer-deterministic: coarse assignment and probe selection
    * are argmax over exact BIGINT dots (ties to the lowest cid), so the
    * whole pipeline — assignment, probes, ADC, re-rank — replays in
    * DuckDB.
    */
  def q94AnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val bcCb = s.sparkContext.broadcast(codebook(raw))
    val bcCents = s.sparkContext.broadcast(centroids(raw))
    val enc = encodeWithList(raw, bcCb, bcCents) // (vec_id, list_id, m, code)
    // probe selection: per query, the Probes best lists by exact
    // integer dot — tiny relational input (NQueries × Lists vectors)
    val qcd = quantLong(raw, "qid", "qxq", NQueries)
      .join(broadcast(quantLong(raw, "cid", "cq", Lists)), Seq("m", "dim"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("qxq") * col("cq")).as("cdot"))
    val byCdot = Window.partitionBy(col("qid")).orderBy(col("cdot").desc, col("cid"))
    val probes = qcd.withColumn("crank", row_number().over(byCdot))
      .filter(col("crank") <= Probes)
      .select(col("qid"), col("cid").as("list_id"))
    // ADC restricted to the probed lists: the codes scan joins the
    // broadcast probe set on the list key, then the broadcast LUT
    val lut = lutOf(raw)
    val adc = enc.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(lut), Seq("qid", "m", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("ldot")).cast("double") / 1e12, 6).as("score_adc"))
    shortlistRerank(raw, adc)
  }

  /** Coarse centroids as quantized driver arrays (Lists × 64 longs). */
  private def centroids(raw: DataFrame): Array[(Long, Array[Long])] = {
    raw.filter(col("vec_id") < Lists)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        (r.getLong(0), r.getSeq[Float](1).iterator.map(f => quant(f.toDouble)).toArray)
      }.sortBy(_._1)
  }

  /** One kernel pass per vector: coarse-list assignment (argmax exact
    * integer dot over [[Lists]] centroids, lowest cid on ties) AND the
    * M subspace codes — the IVF-PQ index build as a single scan.
    * Emits `(vec_id, list_id, m, cid)` where `cid` is the PQ code (the
    * column name matches the LUT's code key for the equi-join).
    */
  private def encodeWithList(raw: DataFrame,
      bcCb: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]],
      bcCents: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]]): DataFrame = {
    val s = raw.sparkSession
    import s.implicits._
    raw.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cb = bcCb.value
        val cents = bcCents.value
        it.flatMap { case (id, emb) =>
          val xq = emb.iterator.map(f => quant(f.toDouble)).toArray
          var bestList = Long.MaxValue
          var bestDot = Long.MinValue
          cents.foreach { case (cid, c) =>
            var d = 0L
            var i = 0
            while (i < c.length) { d += xq(i) * c(i); i += 1 }
            if (d > bestDot || (d == bestDot && cid < bestList)) {
              bestDot = d; bestList = cid
            }
          }
          val listId = bestList
          val codes = pqCodesOf(xq, cb)
          (0 until SubSpaces).iterator.map(m => (id, listId, m.toLong, codes(m).toLong))
        }
      }.toDF("vec_id", "list_id", "m", "cid")
  }

  private val KCenterK = 9

  /** q184: K-CENTER DIVERSITY SAMPLE — farthest-point traversal
    * (Gonzalez 1985, the 2-approximation for the k-center objective),
    * the coreset/diversity selection step a curation pipeline runs when
    * it wants coverage of the embedding space rather than q55's
    * frequency-weighted draw: start from a deterministic seed, then
    * repeatedly pick the vector FARTHEST from everything selected so
    * far. Output is the selection order with each pick's exact squared
    * distance to the previously selected set — the coverage-radius²
    * sequence (non-increasing by construction), which is also the
    * stopping diagnostic a practitioner reads.
    *
    * Determinism across engines: components quantize to integers (the
    * q30/q87 `round(x·1e6)` convention), so every distance is EXACT
    * BIGINT arithmetic and the argmax (ties to the lowest vec_id) can
    * never flip on float noise — an iterative selection would amplify
    * one flipped pick into a different tail, so exactness here is
    * load-bearing, not cosmetic.
    *
    * Scale shape: [[KCenterK]] passes, each ONE narrow map (distance to
    * the single newest center, folded into a running min) plus a
    * single-row struct-max reduce (partial map-side, one tiny
    * exchange); the state frame is localCheckpoint'ed per round so the
    * lineage stays flat. Driver state = the selected centers
    * (K·64 longs), never the corpus. This is the textbook distributed
    * farthest-point loop — k passes is the algorithm, not an
    * implementation artifact.
    */
  def q184KCenterSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Tables.embeddings(s, dir)
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qv"))
    var center = q.filter(col("vec_id") === 0)
      .select(col("qv")).head().getSeq[Long](0).toArray
    val picks = scala.collection.mutable.ListBuffer((1L, 0L, 0L))
    var state = q.withColumn("min_d2", lit(Long.MaxValue))
    var prevCheckpoint: DataFrame = null
    for (ord <- 2 to KCenterK) {
      val cLit = array(center.map(lit(_)).toIndexedSeq: _*)
      val next = state.withColumn("min_d2",
        least(col("min_d2"),
          aggregate(zip_with(col("qv"), cLit, (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x)))
        .localCheckpoint(true)
      // the previous round's checkpoint blocks are dead once the new
      // one is materialized — without this, K-1 corpus-scale snapshots
      // sit in executor storage simultaneously (review finding). The
      // persisted RDD is the one inside the LogicalRDD leaf
      // localCheckpoint returned, not the df.rdd wrapper.
      if (prevCheckpoint != null) prevCheckpoint.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }
      prevCheckpoint = next
      state = next
      // argmax(min_d2, ties to lowest id) carrying the winner's vector —
      // the qv struct field is only compared on impossible full ties
      val pick = state
        .select(max(struct(col("min_d2"), (-col("vec_id")).as("nid"),
          col("qv"))).as("m"))
        .head().getStruct(0)
      picks += ((ord.toLong, -pick.getLong(1), pick.getLong(0)))
      center = pick.getSeq[Long](2).toArray
    }
    picks.toSeq.toDF("sel_ord", "vec_id", "d2_pick").orderBy(col("sel_ord"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_ann_pq" -> (q87AnnPq _),
    "q94_ann_ivf_pq" -> (q94AnnIvfPq _),
    "q184_kcenter_sample" -> (q184KCenterSample _),
  )

  /** Shared oracle prefix: quantized long form, PQ codebook, code
    * assignment (argmin over exact integer subspace distances as a
    * row_number window) and the per-query LUT. MATERIALIZED where
    * referenced repeatedly.
    */
  private def pqPrefixSql: String =
    s"""WITH raw AS (SELECT vec_id, unnest(embedding) AS x,
      |                     generate_subscripts(embedding, 1) AS i FROM embeddings),
      |e AS MATERIALIZED (SELECT vec_id,
      |             CAST(i AS BIGINT) - 1 AS dim,
      |             CAST(x AS DOUBLE) AS xd,
      |             CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq,
      |             (CAST(i AS BIGINT) - 1) // $SubDim AS m
      |      FROM raw),
      |cb AS (SELECT vec_id AS cid, dim, xq AS cq, m FROM e WHERE vec_id < $Codes),
      |dist AS (SELECT e.vec_id, e.m, cb.cid,
      |                sum((e.xq - cb.cq) * (e.xq - cb.cq)) AS d2
      |         FROM e JOIN cb ON cb.m = e.m AND cb.dim = e.dim
      |         GROUP BY 1, 2, 3),
      |codes AS (SELECT vec_id, m, cid AS code FROM (
      |            SELECT *, row_number() OVER (PARTITION BY vec_id, m
      |                                         ORDER BY d2, cid) AS rn
      |            FROM dist) WHERE rn = 1),
      |lut AS (SELECT e.vec_id AS qid, e.m, cb.cid,
      |               sum(e.xq * cb.cq) AS ldot
      |        FROM e JOIN cb ON cb.m = e.m AND cb.dim = e.dim
      |        WHERE e.vec_id < $NQueries
      |        GROUP BY 1, 2, 3)""".stripMargin

  /** Shared oracle tail over an `adc(qid, vec_id, score_adc)` CTE:
    * shortlist window, exact re-rank (the q28 scoring contract
    * restricted to the shortlist), top-k.
    */
  private def pqTailSql: String =
    s"""shortlist AS (SELECT qid, vec_id, score_adc FROM (
      |                SELECT *, row_number() OVER (PARTITION BY qid
      |                    ORDER BY score_adc DESC, vec_id) AS srank
      |                FROM adc) WHERE srank <= $Shortlist),
      |exact AS (SELECT s.qid, s.vec_id, s.score_adc,
      |                 round(sum(q.xd * v.xd), 6) AS score
      |          FROM shortlist s
      |          JOIN e v ON v.vec_id = s.vec_id
      |          JOIN e q ON q.vec_id = s.qid AND q.dim = v.dim
      |          GROUP BY 1, 2, 3),
      |topk AS (SELECT qid, vec_id, score, score_adc,
      |                CAST(row_number() OVER (PARTITION BY qid
      |                                        ORDER BY score DESC, vec_id) AS BIGINT) AS rn
      |         FROM exact)
      |SELECT qid, rn, vec_id AS neighbor_id, score, score_adc
      |FROM topk WHERE rn <= $TopK
      |ORDER BY qid, rn""".stripMargin

  /** The q184 argmax inside a recursive CTE: DuckDB 1.0's arg_max takes
    * no struct key, so (d2 DESC, vec_id ASC) packs into ONE BIGINT as
    * d2·8192 + (8191 − vec_id) — exact while vec_id < 8192 and
    * d2 < 2⁵⁰ (64 dims × (2·10⁶)² = 2.6·10¹⁴ ≈ 2⁴⁸ ✓); the engine's
    * struct-max is unconstrained. */
  private def kcenterD2Sql: String =
    s"""CAST(list_min(list_transform(s.centers,
      |  c -> list_sum(list_transform(range(1, 65),
      |       i -> (e.qv[i] - c[i]) * (e.qv[i] - c[i]))))) AS BIGINT)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q184_kcenter_sample" -> {
      val key = s"($kcenterD2Sql * 8192 + (8191 - e.vec_id))"
      s"""WITH RECURSIVE guard AS (
        |  SELECT CASE WHEN max(vec_id) >= 8192
        |              THEN CAST(error('q184 oracle key packing needs vec_id < 8192')
        |                   AS BIGINT)
        |              ELSE 0 END AS ok
        |  FROM embeddings),
        |sel AS (
        |  SELECT 1 AS ord, CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(0 AS BIGINT) AS d2,
        |         [list_transform(embedding,
        |            x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))] AS centers
        |  FROM embeddings, guard WHERE vec_id = 0 AND guard.ok = 0
        |  UNION ALL
        |  SELECT s.ord + 1 AS ord,
        |         arg_max(e.vec_id, $key) AS vec_id,
        |         arg_max($kcenterD2Sql, $key) AS d2,
        |         list_append(s.centers, arg_max(e.qv, $key)) AS centers
        |  FROM sel s CROSS JOIN (
        |    SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |           list_transform(embedding,
        |             x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |    FROM embeddings) e
        |  WHERE s.ord < $KCenterK
        |  GROUP BY s.ord, s.centers)
        |SELECT CAST(ord AS BIGINT) AS sel_ord, vec_id, d2 AS d2_pick
        |FROM sel ORDER BY sel_ord""".stripMargin
    },
    "q87_ann_pq" ->
      s"""$pqPrefixSql,
        |adc AS (SELECT l.qid, c.vec_id,
        |               round(CAST(sum(l.ldot) AS DOUBLE) / 1e12, 6) AS score_adc
        |        FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.code
        |        WHERE c.vec_id <> l.qid
        |        GROUP BY 1, 2),
        |$pqTailSql""".stripMargin,

    /* q94: the q87 chain with the coarse-quantizer stage in front —
     * exact-integer-dot list assignment for every vector, the same
     * ranking for the query's probe lists, ADC restricted to probed
     * candidates. */
    "q94_ann_ivf_pq" ->
      s"""$pqPrefixSql,
        |cents AS (SELECT vec_id AS ccid, dim, xq AS cxq FROM e WHERE vec_id < $Lists),
        |coarse AS MATERIALIZED (
        |  SELECT e.vec_id, c.ccid, sum(e.xq * c.cxq) AS cdot,
        |         row_number() OVER (PARTITION BY e.vec_id
        |                            ORDER BY sum(e.xq * c.cxq) DESC, c.ccid) AS crank
        |  FROM e JOIN cents c USING (dim)
        |  GROUP BY e.vec_id, c.ccid),
        |assign AS (SELECT vec_id, ccid AS list_id FROM coarse WHERE crank = 1),
        |probes AS (SELECT vec_id AS qid, ccid AS list_id FROM coarse
        |           WHERE vec_id < $NQueries AND crank <= $Probes),
        |adc AS (SELECT p.qid, a.vec_id,
        |               round(CAST(sum(l.ldot) AS DOUBLE) / 1e12, 6) AS score_adc
        |        FROM probes p
        |        JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.qid
        |        JOIN codes c ON c.vec_id = a.vec_id
        |        JOIN lut l ON l.qid = p.qid AND l.m = c.m AND l.cid = c.code
        |        GROUP BY 1, 2),
        |$pqTailSql""".stripMargin,
  )
}
