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

  private val BpeRounds = 4
  private val BpeTopK = 8

  /** Adjacent symbol-pair counts over a '|'-separated word-type table
    * `(sym, n)` — the statistic a BPE trainer maximizes each round.
    * Every overlapping occurrence counts ("a|a|a" holds TWO "a|a"
    * pairs), weighted by the word-type count, exactly as in Sennrich
    * et al. 2016. */
  private def bpePairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("ss", split(col("sym"), "\\|"))
      .filter(size(col("ss")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(0, size(ss) - 2), " +
          "i -> concat(element_at(ss, i + 1), '|', element_at(ss, i + 2)))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))

  /** Apply one merge (the 1-row `win(win_pair)` frame, broadcast) to the
    * word-type table: the winning adjacent pair fuses into one symbol.
    * The sequence is wrapped in sentinels so the literal replace can
    * only match at symbol boundaries. A single left-to-right replace
    * misses back-to-back occurrences (consecutive matches share a '|'
    * the previous replacement consumed: a|b|a|b would stop at ab|a|b),
    * so the boundary-wrapped replace is applied TWICE — pass 1 fuses
    * alternating occurrences, which isolates the survivors between
    * fused symbols, and pass 2 fuses those — giving canonical Sennrich
    * leftmost-non-overlapping results for every NON-self-overlapping
    * pair (first symbol ≠ second; verified exhaustively over all ≤6-
    * symbol words in the spec). Known residual deviation, shared by
    * engine, oracle, and spec so the gate stays self-consistent:
    * same-symbol RUNS under a self-overlapping pair (a|a over aaaa…)
    * fuse at alternating positions, and runs of ≥6 fuse FEWER
    * occurrences than canonical (aa|a|aa|a vs canonical aa|aa|aa) —
    * the two-pass result is still a fixpoint of its own rule (no
    * adjacent occurrence of the pair survives), and English letter
    * runs of ≥4 are rare enough that learned merge tables agree in
    * practice. When canonical behavior matters, use
    * [[bpeMergeCanonical]] (the q186 fold), which matches Sennrich
    * scanning on EVERY case including self-overlapping runs. */
  private val BpeMergeExpr: String = {
    val pat = "'|' || win_pair || '|'"
    val rep = "'|' || replace(win_pair, '|', '') || '|'"
    s"trim(BOTH '|' FROM replace(replace('|' || sym || '|', $pat, $rep), $pat, $rep))"
  }

  private def bpeMerge(words: DataFrame, win: DataFrame): DataFrame =
    words.crossJoin(broadcast(win))
      .select(expr(BpeMergeExpr).as("sym"), col("n"))

  /** CANONICAL Sennrich merge (q186): a left-to-right greedy FOLD over
    * the symbol array — if the accumulator's last symbol is p1 and the
    * incoming symbol is p2, fuse them, else append. This is exactly the
    * reference trainer's scan-with-skip semantics for EVERY pair,
    * including the self-overlapping same-symbol runs where
    * [[BpeMergeExpr]]'s two-pass literal replace fuses alternating
    * positions (the deviation that expression's scaladoc documents):
    * over a|a|a|a the fold yields canonical aa|aa because the fused
    * symbol (p1p2) can never re-match p1. The fold re-copies the
    * accumulator per element — O(len²) per WORD TYPE, and word types
    * are short (bounded by the longest word, not the corpus), so the
    * frame cost is unchanged. The `win` frame carries (win_p1, win_p2).
    */
  private[graft] def bpeMergeCanonical(words: DataFrame, win: DataFrame): DataFrame =
    words.crossJoin(broadcast(win))
      .select(concat_ws("|", expr(
        """aggregate(split(sym, '\\|'), CAST(array() AS ARRAY<STRING>),
          |  (acc, x) -> CASE
          |    WHEN size(acc) > 0 AND element_at(acc, -1) = win_p1 AND x = win_p2
          |    THEN concat(slice(acc, 1, size(acc) - 1),
          |                array(concat(element_at(acc, -1), x)))
          |    ELSE concat(acc, array(x)) END)""".stripMargin)).as("sym"), col("n"))

  /** q149: BPE MERGE LEARNING — the byte-pair-encoding training loop
    * itself (Sennrich et al. 2016, the algorithm behind GPT-2/Llama
    * tokenizers) run distributively and gated: [[BpeRounds]] rounds of
    * count-adjacent-pairs → pick the most frequent → fuse it across the
    * vocabulary, publishing each round's top-[[BpeTopK]] pair
    * leaderboard (rank 1 = the merge actually taken).
    *
    * Trainer shape, not a toy: real BPE training never iterates the
    * corpus — it iterates the WORD-TYPE table (Zipf-collapsed counts).
    * Here the corpus is touched exactly once (letter-run pre-tokenize
    * fused into the scan, one map-side-combined `groupBy(w)`); every
    * round after that is an aggregate over the word-type frame plus a
    * broadcast 1-row winner join. At 100 TB the word-type table is
    * vocabulary-scale (millions of rows, KBs per executor), so R merge
    * rounds cost R tiny jobs, not R corpus passes. Each round's frame
    * is persisted: round r's lineage feeds both round r+1's counts and
    * its merge, and without the barrier the branch count doubles per
    * round.
    *
    * Exactness: counts are BIGINTs, winners tie-break on (cnt DESC,
    * pair ASC), and the merge is a literal (non-regex) replace under
    * identical left-to-right semantics — no float exists in the plan.
    */
  def q149BpeMerges(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, dir, bpeMerge)

  /** q186: the q149 trainer with the CANONICAL fold merge
    * ([[bpeMergeCanonical]]) — closes the two-pass deviation on
    * self-overlapping runs as a gated query of its own (q149 stays as
    * the literal-replace variant both for continuity and because the
    * two differ only on ≥6-symbol same-letter runs, which this corpus —
    * like most natural text — happens not to reach in the learned
    * window; the exhaustive contract spec covers where they diverge).
    */
  def q186BpeCanonical(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, dir, bpeMergeCanonical)

  /** The shared BPE training loop; `mergeFn` applies the 1-row winner
    * frame `(win_pair, win_p1, win_p2)` to the word-type table. */
  private def bpeTrain(s: SparkSession, dir: String,
      mergeFn: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val words0 = Tables.documents(s, dir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(expr("trim(BOTH '|' FROM regexp_replace(w, '(.)', '$1|'))").as("sym"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byCount = Window.orderBy(col("cnt").desc, col("pair").asc)
    val (tops, _) = (1 to BpeRounds).foldLeft((Seq.empty[DataFrame], words0)) {
      case ((acc, words), r) =>
        val pairs = bpePairCounts(words)
        val top = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(BpeTopK)
          .withColumn("rank", row_number().over(byCount))
          .withColumn("round", lit(r))
          .select(col("round"), col("rank"), col("pair"), col("cnt"))
        val win = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(1)
          .select(col("pair").as("win_pair"),
            expr("split(pair, '\\\\|')[0]").as("win_p1"),
            expr("split(pair, '\\\\|')[1]").as("win_p2"))
        val merged = mergeFn(words, win)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (acc :+ top, merged)
    }
    tops.reduce(_.unionByName(_)).orderBy(col("round"), col("rank"))
  }

  /** The q149 oracle's per-round CTE triple: pair counts over w{r-1},
    * the 1-row winner, the merged word table w{r}. */
  private def bpeRoundSql(r: Int): String =
    s"""p$r AS (SELECT list_extract(ss, i + 1) || '|' || list_extract(ss, i + 2) AS pair,
       |              CAST(sum(n) AS BIGINT) AS cnt
       |       FROM (SELECT ss, n, unnest(range(len(ss) - 1)) AS i
       |             FROM (SELECT string_split(sym, '|') AS ss, n FROM w${r - 1}))
       |       GROUP BY 1),
       |top$r AS (SELECT $r AS round,
       |                 CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rank,
       |                 pair, cnt
       |          FROM p$r ORDER BY cnt DESC, pair LIMIT $BpeTopK),
       |win$r AS (SELECT pair FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
       |w$r AS (SELECT trim(replace(replace('|' || sym || '|',
       |                                    '|' || w.pair || '|',
       |                                    '|' || replace(w.pair, '|', '') || '|'),
       |                            '|' || w.pair || '|',
       |                            '|' || replace(w.pair, '|', '') || '|'), '|') AS sym, n
       |        FROM w${r - 1}, win$r w)""".stripMargin

  /** q186's per-round CTE triple: identical to [[bpeRoundSql]] except
    * the merge is the canonical left-to-right fold (list_reduce over
    * single-element lists — the accumulator's slice-and-append mirrors
    * the engine's aggregate() lambda symbol for symbol). */
  private def bpeRoundCanonicalSql(r: Int): String =
    s"""p$r AS (SELECT list_extract(ss, i + 1) || '|' || list_extract(ss, i + 2) AS pair,
       |              CAST(sum(n) AS BIGINT) AS cnt
       |       FROM (SELECT ss, n, unnest(range(len(ss) - 1)) AS i
       |             FROM (SELECT string_split(sym, '|') AS ss, n FROM w${r - 1}))
       |       GROUP BY 1),
       |top$r AS (SELECT $r AS round,
       |                 CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rank,
       |                 pair, cnt
       |          FROM p$r ORDER BY cnt DESC, pair LIMIT $BpeTopK),
       |win$r AS (SELECT string_split(pair, '|')[1] AS p1,
       |                 string_split(pair, '|')[2] AS p2
       |          FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
       |w$r AS (SELECT array_to_string(
       |               list_reduce(list_transform(string_split(sym, '|'), x -> [x]),
       |                 (acc, x) -> CASE WHEN acc[-1] = w.p1 AND x[1] = w.p2
       |                   THEN list_append(acc[1:-2], acc[-1] || x[1])
       |                   ELSE list_concat(acc, x) END), '|') AS sym, n
       |        FROM w${r - 1}, win$r w)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_tokenize" -> (q88Tokenize _),
    "q111_tokenize_pack" -> (q111TokenizePack _),
    "q149_bpe_merges" -> (q149BpeMerges _),
    "q186_bpe_canonical" -> (q186BpeCanonical _),
  )

  val oracleSql: Map[String, String] = Map(
    "q186_bpe_canonical" ->
      s"""WITH pieces AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |                FROM documents),
        |w0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1|', 'g'), '|') AS sym,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM pieces GROUP BY 1),
        |${(1 to BpeRounds).map(bpeRoundCanonicalSql).mkString(",\n")}
        |SELECT round, rank, pair, cnt FROM (
        |  ${(1 to BpeRounds).map(r => s"SELECT * FROM top$r").mkString(" UNION ALL ")}
        |) ORDER BY round, rank""".stripMargin,
    "q149_bpe_merges" ->
      s"""WITH pieces AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |                FROM documents),
        |w0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1|', 'g'), '|') AS sym,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM pieces GROUP BY 1),
        |${(1 to BpeRounds).map(bpeRoundSql).mkString(",\n")}
        |SELECT round, rank, pair, cnt FROM (
        |  ${(1 to BpeRounds).map(r => s"SELECT * FROM top$r").mkString(" UNION ALL ")}
        |) ORDER BY round, rank""".stripMargin,
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
