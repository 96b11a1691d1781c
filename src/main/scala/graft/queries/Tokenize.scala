package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Tokenizer plumbing (q88): the GPT-2-style pre-tokenize → vocabulary
  * lookup → byte-fallback pipeline every LLM data run executes to turn
  * text into token counts — the layer between raw documents and q77's
  * sequence packing.
  *
  * Stage 1 pre-tokenizes with a regex over LITERAL character classes
  * (letter runs, digit runs, punctuation runs on the lowercased text;
  * whitespace is spelled as explicit characters rather than `\s` so
  * Java regex and RE2 produce identical pieces — the q64 PII-scrub
  * rule). Stage 2
  * builds the corpus vocabulary: the top [[VocabSize]] pieces by
  * (count desc, piece asc), ids assigned in that order — the
  * deterministic stand-in for a trained BPE merge table (which at scale
  * ships as a broadcast artifact exactly like this one). Stage 3 maps
  * every piece: vocabulary hits cost one token, out-of-vocabulary
  * pieces fall back to their character count (the byte-fallback rule
  * that keeps open-vocabulary coverage total).
  *
  * Scale shape: pre-tokenization is a codegen'd projection fused into
  * the scan; the vocabulary build is one map-side-combined aggregate
  * over the piece space (Zipf-collapsed before the exchange) with a
  * vocabulary-sized top-k; the mapping pass is a BROADCAST left join —
  * the corpus never shuffles. The per-doc aggregate carries the head
  * token-id string (first 8 positions, order restored by array_sort
  * over (pos, repr) structs) so the gate checks token ORDER, not just
  * counts. The one global window runs over the already-aggregated
  * vocabulary frame (vocabulary-sized, never the corpus — the TokenDict
  * discipline).
  */
object Tokenize {

  private val VocabSize = 256
  private val HeadLen = 8
  // whitespace spelled as explicit characters, not \s: Java's \s matches
  // vertical tab (\x0B) where RE2's does not, so \s inside the negated
  // class would diverge on a VT-bearing document
  private val PiecePat = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]+"

  def q88Tokenize(s: SparkSession, dir: String): DataFrame = {
    // Column-API regexp_extract_all with lit(): the pattern reaches the
    // regex engine verbatim (an expr() SQL literal would eat the \s)
    val pieces = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")), lit(PiecePat), lit(0)))
          .as(Seq("pos", "piece")))
    val counts = pieces.groupBy(col("piece")).agg(count(lit(1)).as("n"))
    // vocabulary-sized input: the window ranks the distinct-piece
    // aggregate, not the corpus
    val byFreq = Window.orderBy(col("n").desc, col("piece"))
    val vocab = counts.withColumn("id", (row_number().over(byFreq) - 1).cast("long"))
      .filter(col("id") < VocabSize)
      .select(col("piece"), col("id"))
    val tagged = pieces.join(broadcast(vocab), Seq("piece"), "left")
      .withColumn("units",
        when(col("id").isNotNull, lit(1L)).otherwise(length(col("piece")).cast("long")))
      .withColumn("repr",
        when(col("id").isNotNull, col("id").cast("string"))
          .otherwise(concat(lit("B"), length(col("piece")).cast("string"))))
    tagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(col("id").isNotNull.cast("long")).as("n_vocab"),
        sum(col("id").isNull.cast("long")).as("n_oov"),
        sum(col("units")).as("n_units"),
        expr(s"concat_ws(',', transform(array_sort(collect_list(" +
          s"CASE WHEN pos < $HeadLen THEN struct(pos, repr) END)), t -> t.repr))")
          .as("head"))
      .orderBy(col("doc_id"))
  }

  private val PackUnits = 1024L

  /** Tokenize-and-pack (q111): the ACTUAL pretraining data-prep output
    * shape — documents encoded by the q88 tokenizer (corpus-frequency
    * vocabulary, byte-fallback units for OOV pieces) and laid out into
    * fixed-[[PackUnits]] training sequences by the q77 pack-and-chop
    * law. The two gated operators compose in ONE declarative plan: the
    * packing cumsum runs over tokenizer UNIT counts, so a vocabulary
    * change (more OOV → more byte-fallback units) shifts every
    * downstream pack boundary exactly as it would in production.
    *
    * Scale shape: q88's piece aggregate + broadcast vocab join (corpus
    * never shuffles for the encode), ONE per-doc unit-count aggregate,
    * then q77's single per-source cumsum exchange + narrow span
    * explode. Linear end to end; the pack layout is deterministic under
    * the unique (source, doc_id) ordering.
    */
  def q111TokenizePack(s: SparkSession, dir: String): DataFrame = {
    val pieces = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(regexp_extract_all(lower(col("text")), lit(PiecePat), lit(0)))
          .as("piece"))
    val counts = pieces.groupBy(col("piece")).agg(count(lit(1)).as("n"))
    val byFreq = Window.orderBy(col("n").desc, col("piece"))
    val vocab = counts.withColumn("id", (row_number().over(byFreq) - 1).cast("long"))
      .filter(col("id") < VocabSize)
      .select(col("piece"), col("id"))
    val counted = pieces.join(broadcast(vocab), Seq("piece"), "left")
      .withColumn("units",
        when(col("id").isNotNull, lit(1L)).otherwise(length(col("piece")).cast("long")))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("units")).as("n_tok"))
    Chunking.packLayout(counted, PackUnits)
      .select(col("source"), col("pack_id"), col("doc_id"),
        col("n_tok").as("n_units"), col("tok_in_pack").as("units_in_pack"),
        col("is_head"))
      .orderBy(col("source"), col("pack_id"), col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_tokenize" -> (q88Tokenize _),
    "q111_tokenize_pack" -> (q111TokenizePack _),
  )

  val oracleSql: Map[String, String] = Map(
    "q88_tokenize" ->
      s"""WITH p0 AS (SELECT doc_id,
        |                    regexp_extract_all(lower(text), '$PiecePat') AS ps
        |             FROM documents),
        |pieces AS (SELECT doc_id, unnest(ps) AS piece,
        |                  generate_subscripts(ps, 1) - 1 AS pos
        |           FROM p0),
        |counts AS (SELECT piece, count(*) AS n FROM pieces GROUP BY 1),
        |vocab AS (SELECT piece, CAST(row_number() OVER (ORDER BY n DESC, piece) - 1
        |                            AS BIGINT) AS id
        |          FROM counts
        |          QUALIFY id < $VocabSize),
        |tagged AS (SELECT p.doc_id, p.pos, p.piece, v.id,
        |                  CASE WHEN v.id IS NOT NULL THEN 1
        |                       ELSE length(p.piece) END AS units,
        |                  CASE WHEN v.id IS NOT NULL THEN CAST(v.id AS VARCHAR)
        |                       ELSE 'B' || CAST(length(p.piece) AS VARCHAR) END AS repr
        |           FROM pieces p LEFT JOIN vocab v USING (piece))
        |SELECT doc_id,
        |       count(*) AS n_pieces,
        |       CAST(sum(CASE WHEN id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab,
        |       CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(sum(units) AS BIGINT) AS n_units,
        |       string_agg(repr, ',' ORDER BY pos) FILTER (WHERE pos < $HeadLen) AS head
        |FROM tagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q88's encode chain feeding q77's pack-layout chain, unit counts in
    // place of whitespace token counts
    "q111_tokenize_pack" ->
      s"""WITH p0 AS (SELECT doc_id, source,
        |                    regexp_extract_all(lower(text), '$PiecePat') AS ps
        |             FROM documents),
        |pieces AS (SELECT doc_id, source, unnest(ps) AS piece FROM p0),
        |counts AS (SELECT piece, count(*) AS n FROM pieces GROUP BY 1),
        |vocab AS (SELECT piece, CAST(row_number() OVER (ORDER BY n DESC, piece) - 1
        |                            AS BIGINT) AS id
        |          FROM counts
        |          QUALIFY id < $VocabSize),
        |t AS (SELECT p.doc_id, p.source,
        |             CAST(sum(CASE WHEN v.id IS NOT NULL THEN 1
        |                           ELSE length(p.piece) END) AS BIGINT) AS n_tok
        |      FROM pieces p LEFT JOIN vocab v USING (piece)
        |      GROUP BY 1, 2),
        |c AS (SELECT *,
        |             CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                  AS BIGINT) AS tok_end
        |      FROM t),
        |b AS (SELECT *, tok_end - n_tok AS tok_start FROM c),
        |u AS (SELECT b.*, unnest(range(tok_start // $PackUnits,
        |                              (tok_end - 1) // $PackUnits + 1)) AS pack_id
        |      FROM b)
        |SELECT source, pack_id, doc_id, n_tok AS n_units,
        |       least(tok_end, (pack_id + 1) * $PackUnits)
        |         - greatest(tok_start, pack_id * $PackUnits) AS units_in_pack,
        |       pack_id = tok_start // $PackUnits AS is_head
        |FROM u ORDER BY source, pack_id, doc_id""".stripMargin,
  )
}
