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

  /** Token-set Jaccard near-dup, all-pairs baseline (O(n²) — correctness
    * oracle for the LSH variant below; at scale q26 replaces this).
    */
  def q25Jaccard(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val a = t.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val inter = size(array_intersect(col("toks_a"), col("toks_b"))).cast("double")
    val uni = (size(col("toks_a")) + size(col("toks_b"))).cast("double") - inter
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= 0.95)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH banding: signature per doc, band hashes, self-join on
    * (band, hash) buckets → candidate pairs, est. Jaccard from signature
    * agreement. The scale path: the only join is on band-hash buckets, so
    * work is proportional to collisions, not n². No SQL oracle (hash
    * permutations aren't expressible in DuckDB) — rows-only check.
    */
  def q26MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"),
        minhashSignature(array_distinct(tokens(col("text"))), MinhashK).as("sig"))
      .withColumn("bands", lshBandHashes(col("sig"), MinhashK, LshBands))
    val exploded = sigs.select(col("doc_id"), col("sig"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = exploded.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("band_idx"), col("band_hash"))
    val b = exploded.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(minhashEstJaccard(col("sig_a"), col("sig_b"), MinhashK), 6).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
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
  def q28CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("score", round(dot(col("qemb"), col("embedding")), 6))
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
  def q29CosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("label").as("label_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("score_raw", dot(col("emb_a"), col("emb_b")))
      .filter(col("score_raw") >= 0.4)
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
