package graft.modules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Records

/** The deck schedule clock: assigns each keyword ordinal the simulation
  * date in effect when it executes.
  *
  * The reference implements this as a sequential state machine carrying a
  * mutable `date` across keywords (compdat.py:72-114, wcon.py:26-50,
  * gruptree.py:94-123). Re-expressed as window functions over the keyword
  * ordinal (SURVEY.md A8): forward-filled last explicit DATES/START date +
  * the running TSTEP-day sum since that date. One unpartitioned window over
  * the (tiny, driver-sized) keyword spine — per-deck; for a corpus of decks
  * partition the windows by deck id.
  */
object Schedule {

  private val MonthMap: Column = {
    val pairs = Seq(
      "JAN" -> 1, "FEB" -> 2, "MAR" -> 3, "APR" -> 4, "MAY" -> 5, "JUN" -> 6,
      "JUL" -> 7, "JLY" -> 7, "AUG" -> 8, "SEP" -> 9, "OCT" -> 10,
      "NOV" -> 11, "DEC" -> 12)
    map(pairs.flatMap { case (m, n) => Seq(lit(m), lit(n)) }: _*)
  }

  /** Parse an Eclipse date record `1 'JAN' 2000 [time]` into a timestamp.
    * Reference: parse_opmio_date_rec, common.py:352-357 + month map
    * common.py:96-111.
    */
  def parseDateRecord: Column =
    make_date(Records.int(2), element_at(MonthMap, upper(Records.str(1))), Records.int(0))
      .cast("timestamp")

  /** (keywordIdx, date) for every keyword in the deck event stream. The
    * running clock is PER DECK: every window partitions on `deckId` when
    * the frame carries one (DeckParser always emits it — constant for a
    * single deck, the corpus key for a many-deck frame), so a 1000-deck
    * corpus runs 1000 independent partitions instead of funnelling
    * through one global window. `keepDeckId` additionally keeps the key
    * column in the output — required to join correctly on a multi-deck
    * frame (keywordIdx alone repeats across decks); [[withDates]] does
    * this automatically.
    */
  def keywordDates(events: DataFrame, keepDeckId: Boolean = false): DataFrame = {
    val deckKeys = if (events.columns.contains("deckId")) Seq("deckId") else Nil
    val perKw = events
      .groupBy((deckKeys :+ "keywordIdx" :+ "keyword").map(col): _*)
      .agg(
        // last date record of a DATES/START block is the state afterwards
        max(when(col("keyword").isin("DATES", "START") && size(col("items")) >= 3,
          struct(col("recordIdx"), parseDateRecord.as("d")))).as("dateRec"),
        sum(when(col("keyword") === "TSTEP", Records.itemsSum).otherwise(0.0)).as("tstepDays"))
      .select((deckKeys.map(col) :+ col("keywordIdx") :+
        col("dateRec.d").as("explicitDate") :+ col("tstepDays")): _*)
    val w = Window.partitionBy(deckKeys.map(col): _*).orderBy(col("keywordIdx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastDate = last(col("explicitDate"), ignoreNulls = true).over(w)
    val cumTstep = sum(col("tstepDays")).over(w)
    val cumAtDate = last(when(col("explicitDate").isNotNull, cumTstep), ignoreNulls = true).over(w)
    val outKeys = if (keepDeckId) deckKeys else Nil
    perKw
      .withColumn("DATE",
        when(lastDate.isNotNull,
          lastDate + make_dt_interval(lit(0), lit(0), lit(0),
            (cumTstep - coalesce(cumAtDate, lit(0.0))) * 86400.0)))
      .select((outKeys.map(col) :+ col("keywordIdx") :+ col("DATE")): _*)
  }

  /** Attach the in-effect DATE to an event frame on (deckId?, keywordIdx). */
  def withDates(events: DataFrame): DataFrame = {
    val hasDeck = events.columns.contains("deckId")
    val keys = (if (hasDeck) Seq("deckId") else Nil) :+ "keywordIdx"
    events.join(keywordDates(events, keepDeckId = hasDeck), keys, "left")
  }

  /** The corpus key columns: `deckId` when the frame carries one.
    * CONTRACT: at most ONE key — callers (e.g. Compdat.applyWelopen)
    * alias the single key to fixed names like `defDeck`; growing this
    * beyond one column requires revisiting every `dk.map(... .as(...))`
    * site.
    */
  def deckKeys(events: DataFrame): Seq[String] =
    if (events.columns.contains("deckId")) Seq("deckId") else Nil

  /** Guard for the record-level state machines' DEFAULT single-deck
    * entry points (compdat, gruptree, msw, wcon): without the corpus key
    * in the output, a frame holding several decks would silently
    * interleave unrelated wells. Each module's `keepDeckId = true` mode
    * is the corpus path — every ordinal join and window there keys on
    * (deckId, …), so one multi-deck frame processes per-deck semantics
    * in one plan.
    */
  def requireSingleDeck(events: DataFrame, module: String): Unit =
    if (events.columns.contains("deckId")) {
      val decks = events.select("deckId").distinct().limit(2).collect()
      require(decks.length <= 1,
        s"$module processes one deck per call (WELL-keyed state is per-deck); " +
          "got a multi-deck frame — apply the module per deckId group instead")
    }
}
