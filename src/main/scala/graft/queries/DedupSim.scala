package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SimilarityFunctions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication + similarity-search queries: exact dedup, token-set
  * Jaccard near-dup, MinHash+LSH candidates, SimHash, brute-force cosine
  * top-k, and an LSH-bucketed ANN variant (the scale path).
  *
  * Scale notes per query are in each scaladoc — the all-pairs variants are
  * the correctness baselines; the banded/bucketed versions are what runs
  * at 100 TB.
  */
object DedupSim {

  private val MinhashK = 32
  private val LshBands = 8

  /** Exact dedup by content hash (hash-groupBy; one shuffle on md5(text)). */
  def q24ExactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Token-set Jaccard near-dup. This corpus has a tiny vocabulary
    * (≤64 distinct tokens), so each document's distinct-token set packs
    * into one 64-bit mask (vocabulary index built at runtime, bit_or
    * aggregate) and Jaccard becomes codegen'd integer bit math:
    * popcount(a&b)/popcount(a|b). The pair space is walked over *distinct
    * masks* (deduped set shapes), then expanded back to qualifying doc
    * pairs — interpreted array ops never run per pair. For open
    * vocabularies the MinHash path (q26) is the scale route; a postings
    * prefix-filter join is the exact-threshold route.
    */
  def q25Jaccard(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val vocab = toks.select(col("tok")).distinct()
      .withColumn("bit", row_number().over(Window.orderBy(col("tok"))).cast("long") - 1)
    val masks = toks.join(broadcast(vocab), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(expr("bit_or(shiftleft(1L, cast(bit AS int)))").as("mask"))
    val dm = masks.select(col("mask")).distinct()
    val inter = bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double")
    val union = bit_count(col("mask_a").bitwiseOR(col("mask_b"))).cast("double")
    val maskPairs = dm.select(col("mask").as("mask_a"))
      .crossJoin(dm.select(col("mask").as("mask_b")))
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= 0.95)
    masks.select(col("doc_id").as("doc_a"), col("mask").as("mask_a"))
      .join(broadcast(maskPairs), Seq("mask_a"))
      .join(masks.select(col("doc_id").as("doc_b"), col("mask").as("mask_b")), Seq("mask_b"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH dedup clustering: signature per doc, band hashes,
    * cluster id = min doc_id over all docs sharing any band bucket (one
    * agglomeration hop). Output is LINEAR in the corpus — the dedup
    * semantic ("which docs collapse together") without materializing the
    * quadratic near-dup pair set, which on a high-similarity corpus is
    * O(n²) no matter how good the index is. No SQL oracle (seeded hash
    * permutations aren't expressible in DuckDB) — rows-only check.
    */
  def q26MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // cached: band explode would otherwise re-run the k×|tokens| hash
    // cascade per downstream row via collapsed projections
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"),
        minhashSignature(array_distinct(tokens(col("text"))), MinhashK).as("sig"))
      .cache()
    val bands = sigs.select(col("doc_id"),
      posexplode(lshBandHashes(col("sig"), MinhashK, LshBands)).as(Seq("band_idx", "band_hash")))
    val bucketMin = bands.groupBy(col("band_idx"), col("band_hash"))
      .agg(min(col("doc_id")).as("bucket_min"), count(lit(1)).as("bucket_size"))
    bands.join(bucketMin, Seq("band_idx", "band_hash"))
      .groupBy(col("doc_id"))
      .agg(min(col("bucket_min")).as("cluster_id"), max(col("bucket_size")).as("max_bucket"))
      .withColumn("is_dup", col("cluster_id") < col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** SimHash per document (64-bit, single pass). Rows-only check. */
  def q27Simhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), simhash(array_distinct(tokens(col("text")))).as("simhash"))
      .orderBy(col("doc_id"))

  /** Brute-force cosine top-k: each query vector (vec_id < 10) against the
    * full embedding table. Embeddings are L2-normalized, so cosine == dot.
    * The broadcast side is the small query set — the big side streams.
    */
  /** Long-format (vec_id, dim, x) view of the embedding table — the shape
    * for heavy vector math: per-pair dot products become codegen'd
    * equi-joins + hash aggregates instead of interpreted per-row
    * higher-order array folds (~50x faster at 500x500x64).
    */
  private def embLong(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))

  def q28CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embLong(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("dim"), col("x").as("qx"))
    val scored = e.join(broadcast(q), Seq("dim"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("qx") * col("x")), 6).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("vec_id").as("neighbor_id"), col("score"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Embedding-cosine near-dup: all pairs with dot >= 0.4 (threshold fits
    * this corpus's similarity distribution). All-pairs baseline; the
    * LSH-bucketed variant is q30.
    */
  /** Embedding-cosine near-dup, brute force done right for a
    * broadcastable matrix: the (tiny: n×64 floats) matrix is broadcast and
    * each partition runs a tight primitive-array dot loop over its slice
    * of row indices against all higher indices, emitting only qualifying
    * pairs — this is genuine per-partition numeric kernel work, the one
    * place mapPartitions beats expression evaluation (interpreted
    * higher-order array folds are ~50x slower; a join on the 64 `dim` keys
    * has catastrophic key fanout). When the matrix outgrows a broadcast,
    * q30's LSH bucketing is the scale path.
    */
  def q29CosineNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val mat = rows.map(_._2.map(_.toDouble))
    val bc = s.sparkContext.broadcast((ids, mat))
    val scored = s.createDataset(ids.indices.toSeq)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (id, m) = bc.value
        it.flatMap { a =>
          val va = m(a)
          (a + 1 until m.length).iterator.flatMap { b =>
            val vb = m(b)
            var d = 0.0; var i = 0
            while (i < va.length) { d += va(i) * vb(i); i += 1 }
            if (d >= 0.4) Some((id(a), id(b), d)) else None
          }
        }
      }.toDF("id_a", "id_b", "score_raw")
    val labels = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    scored
      .join(broadcast(labels.select(col("vec_id").as("id_a"), col("label").as("label_a"))), Seq("id_a"))
      .join(broadcast(labels.select(col("vec_id").as("id_b"), col("label").as("label_b"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(col("score_raw"), 6).as("score"),
        (col("label_a") === col("label_b")).as("same_label"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Random-hyperplane LSH ANN (the scale path for q28/q29): 12 fixed
    * pseudo-hyperplanes (sign of dot with deterministic ±1 planes derived
    * from xxhash64(plane, dim)) bucket each vector; candidates only join
    * within a bucket. Rows-only check (hash planes aren't in DuckDB).
    */
  def q30AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val planes = 12
    val signBit = (p: Int, emb: Column) => {
      // plane p's component d is +1/-1 from xxhash64(p, d); dot sign = bucket bit
      val contrib = zip_with(emb,
        transform(sequence(lit(0), size(emb) - 1),
          d => when(xxhash64(lit(p), d) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))),
        (x, w) => x.cast("double") * w)
      when(aggregate(contrib, lit(0.0), (acc, x) => acc + x) > 0, lit(1L)).otherwise(lit(0L))
    }
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val bucketed = e.withColumn("bucket",
      (0 until planes).map(p => signBit(p, col("embedding")) * (1L << p)).reduce(_ + _))
    val a = bucketed.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = bucketed.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("score", round(dot(col("emb_a"), col("emb_b")), 6))
      .select(col("bucket"), col("id_a"), col("id_b"), col("score"))
      .orderBy(col("bucket"), col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_exact_dedup" -> (q24ExactDedup _),
    "q25_jaccard" -> (q25Jaccard _),
    "q26_minhash_lsh" -> (q26MinhashLsh _),
    "q27_simhash" -> (q27Simhash _),
    "q28_cosine_topk" -> (q28CosineTopK _),
    "q29_cosine_neardup" -> (q29CosineNearDup _),
    "q30_ann_lsh" -> (q30AnnLsh _),
  )

  val oracleSql: Map[String, String] = Map(
    "q24_exact_dedup" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_id""",
    "q25_jaccard" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS toks
                    FROM documents)
         SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / (CAST(len(a.toks) + len(b.toks) AS DOUBLE)
                     - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) AS jaccard
           FROM t a JOIN t b ON a.doc_id < b.doc_id)
         WHERE jaccard >= 0.95 ORDER BY doc_a, doc_b""",
    "q28_cosine_topk" ->
      """WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS i FROM embeddings),
         d AS (SELECT q.vec_id AS qid, b.vec_id AS nid,
                      round(sum(CAST(q.x AS DOUBLE) * CAST(b.x AS DOUBLE)), 6) AS score
               FROM (SELECT * FROM e WHERE vec_id < 10) q
               JOIN e b USING (i)
               WHERE b.vec_id <> q.vec_id GROUP BY 1, 2),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY score DESC, nid) AS BIGINT) AS rn FROM d)
         SELECT qid, rn, nid AS neighbor_id, score FROM r WHERE rn <= 5
         ORDER BY qid, rn""",
    "q29_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, label, unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS i FROM embeddings),
         d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                      any_value(a.label) = any_value(b.label) AS same_label,
                      sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS score_raw
               FROM e a JOIN e b USING (i)
               WHERE a.vec_id < b.vec_id GROUP BY 1, 2)
         SELECT id_a, id_b, round(score_raw, 6) AS score, same_label
         FROM d WHERE score_raw >= 0.4 ORDER BY id_a, id_b""",
  )
}
