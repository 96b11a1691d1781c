package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed access into a DeckEvent `items` array: positional item extraction
  * with `1*`-default → null normalization and per-column default values.
  * Mirrors the reference's JSON-schema record parsing
  * (parse_opmio_deckrecord, common.py:269-349) as pure Column expressions.
  */
object Records {

  /** Raw item i (0-based); null when absent or defaulted (`1*`).
    * `get` (not `element_at`) — out-of-range must be null, not an ANSI error.
    */
  def item(i: Int): Column = {
    val raw = get(col("items"), lit(i))
    when(raw === "1*", lit(null)).otherwise(raw)
  }

  def str(i: Int): Column = item(i)
  def str(i: Int, default: String): Column = coalesce(item(i), lit(default))

  /** try_cast, not cast: Catalyst freely reorders deterministic filters,
    * so a numeric extraction can be EVALUATED against records of another
    * keyword (e.g. a WELOPEN coordinate predicate pushed past the keyword
    * filter onto WLIST rows whose item is a well name) — under ANSI cast
    * that's a job-killing error on perfectly valid decks.
    */
  def int(i: Int): Column = item(i).try_cast("int")
  def int(i: Int, default: Int): Column = coalesce(int(i), lit(default))

  def dbl(i: Int): Column = item(i).try_cast("double")
  def dbl(i: Int, default: Double): Column = coalesce(dbl(i), lit(default))

  /** All items from position `from` onward (WLIST-style trailing varargs). */
  def rest(from: Int): Column = slice(col("items"), lit(from + 1), lit(1000000))

  /** Reshape a flat numeric DATA record into rows of `names.size` columns —
    * the reference's keyworddata_to_df list reshape (common.py:187-266, R6).
    * Emits (row_idx, names...) per chunk; parse-side chunking + one explode,
    * no shuffle.
    */
  def dataChunks(names: Seq[String]): Column = {
    val dim = names.size
    transform(
      sequence(lit(0), (size(col("items")) / dim).cast("int") - 1),
      r => struct(
        r.as("row_idx") +:
          names.zipWithIndex.map { case (nm, i) =>
            val raw = get(col("items"), r * dim + i)
            // defaulted slots (`1*`) must become null BEFORE the cast —
            // ANSI mode makes cast('1*' as double) an error, not null
            when(raw === "1*", lit(null)).otherwise(raw).cast("double").as(nm)
          }: _*))
  }

  /** Sum of all items as doubles (TSTEP day lists). */
  def itemsSum: Column =
    aggregate(transform(col("items"), x => x.cast("double")), lit(0.0), (a, x) => a + x)
}
