package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Training-data layout operators: fixed-window document chunking with
  * overlap (the RAG / long-context ingestion shape) and GPT-style
  * concat-and-split sequence packing (the pretraining batch-layout
  * shape). Both are pure layout computations over closed-form token /
  * char arithmetic, so the DuckDB oracle replays them exactly.
  */
object Chunking {

  private val ChunkW = 240 // window (chars)
  private val ChunkS = 180 // stride (chars) -> 60-char overlap

  /** Document chunking with overlap (q76): split every document into
    * [[ChunkW]]-char windows advancing by [[ChunkS]] chars (start <
    * doc length), the standard retrieval-ingestion layout. Emits one
    * row per chunk with its offsets and content digest.
    *
    * Scale shape: scan → narrow explode(sequence) → codegen'd substring
    * + md5 projection — exchange-free up to the trailing presentation
    * orderBy (driver-contract determinism; a production pipeline drops
    * it): the fan-out happens inside the task that read the row, so a
    * 100 TB corpus chunks in one pass with no shuffle of either
    * documents or chunks. Integer `div` (not `/`)
    * keeps the chunk count in long arithmetic, and the greatest() guard
    * keeps the dividend non-negative so a zero-length doc yields exactly
    * one (empty) chunk WITHOUT relying on negative integer-division
    * semantics, which are an engine-version detail (floor vs truncate)
    * this layout must never depend on.
    */
  def q76Chunk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .withColumn("last_chunk", expr(s"(greatest(n_chars_actual, 1L) - 1) div $ChunkS"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("last_chunk"))))
      .withColumn("chunk",
        expr(s"substring(text, CAST(chunk_idx * $ChunkS + 1 AS INT), $ChunkW)"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkS + 1).as("chunk_start"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk").cast("binary")).as("chunk_md5"),
        (col("last_chunk") + 1).as("n_chunks"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val PackB = 1024 // tokens per packed training sequence

  /** Sequence-packing layout (q77): concatenate each source's documents
    * in doc_id order and split the token stream into [[PackB]]-token
    * training sequences — the GPT-style pack-and-chop batch layout. One
    * row per (document, pack) span: how many of the doc's tokens land
    * in that pack and whether the doc's head starts there (a span count
    * > 1 means the document straddles a pack boundary).
    *
    * Scale shape: ONE shuffle — the per-source running token sum — then
    * a narrow pack-span explode; the span fan-out is (doc tokens /
    * [[PackB]]) + 1, linear in input. The layout is well-defined because
    * doc_id is the table's unique key: the ROWS-framed cumsum (pinned on
    * BOTH engines — DuckDB's default frame is RANGE, which would merge
    * tied keys) is only deterministic under a unique (source, doc_id)
    * ordering. The window key doubles as the packing shard: at 100 TB you don't pack one global stream anyway —
    * you pack per shard exactly like this, with `source` replaced by a
    * deterministic shard key, so the cumsum never serializes through
    * one partition.
    */
  def q77Pack(s: SparkSession, dir: String): DataFrame =
    q77PackOver(Tables.documents(s, dir), PackB)

  /** The q77 layout over any (doc_id, source, text) frame with a
    * configurable pack size — split out so the layout laws are
    * property-testable on random corpora.
    */
  private[graft] def q77PackOver(docs: DataFrame, packB: Long): DataFrame =
    packLayout(
      docs.select(col("doc_id"), col("source"), tokenCount(col("text")).as("n_tok")),
      packB)

  /** The pack-and-chop span layout over a PRE-COUNTED `(doc_id, source,
    * n_tok)` frame — q77 feeds whitespace token counts, q111 feeds the
    * q88 tokenizer's unit counts; the layout law is one definition.
    */
  private[queries] def packLayout(counted: DataFrame, packB: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tok"))
      .withColumn("pack_id", explode(sequence(
        expr(s"tok_start div $packB"), expr(s"(tok_end - 1) div $packB"))))
      .select(col("source"), col("pack_id"), col("doc_id"), col("n_tok"),
        (least(col("tok_end"), (col("pack_id") + 1) * packB) -
          greatest(col("tok_start"), col("pack_id") * packB)).as("tok_in_pack"),
        (col("pack_id") === expr(s"tok_start div $packB")).as("is_head"))
      .orderBy(col("source"), col("pack_id"), col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_chunk" -> (q76Chunk _),
    "q77_pack" -> (q77Pack _),
  )

  val oracleSql: Map[String, String] = Map(
    "q76_chunk" ->
      s"""WITH d AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |         (greatest(CAST(length(text) AS BIGINT), 1) - 1) // $ChunkS
        |           AS last_chunk
        |  FROM documents),
        |u AS (SELECT d.*, unnest(range(0, last_chunk + 1)) AS chunk_idx FROM d),
        |c AS (SELECT doc_id, chunk_idx, last_chunk, n,
        |             substr(text, CAST(chunk_idx * $ChunkS + 1 AS INT), $ChunkW)
        |               AS chunk
        |      FROM u)
        |SELECT doc_id, chunk_idx, chunk_idx * $ChunkS + 1 AS chunk_start,
        |       CAST(length(chunk) AS BIGINT) AS chunk_len,
        |       md5(chunk) AS chunk_md5,
        |       last_chunk + 1 AS n_chunks
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q77_pack" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT *,  -- HUGEINT sum pinned to BIGINT; ROWS frame pinned to
        |             -- match the Spark window (DuckDB defaults to RANGE,
        |             -- which merges tied order keys into one prefix sum)
        |             CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                  AS BIGINT) AS tok_end
        |      FROM t),
        |b AS (SELECT *, tok_end - n_tok AS tok_start FROM c),
        |u AS (SELECT b.*, unnest(range(tok_start // $PackB,
        |                              (tok_end - 1) // $PackB + 1)) AS pack_id
        |      FROM b)
        |SELECT source, pack_id, doc_id, n_tok,
        |       least(tok_end, (pack_id + 1) * $PackB)
        |         - greatest(tok_start, pack_id * $PackB) AS tok_in_pack,
        |       pack_id = tok_start // $PackB AS is_head
        |FROM u ORDER BY source, pack_id, doc_id""".stripMargin,
  )
}
