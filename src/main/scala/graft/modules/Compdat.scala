package graft.modules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Ops
import graft.io.{DeckParser, Records => R}

/** COMPDAT schedule extraction: one row per (well, connection, date), with
  * WELOPEN state overrides applied.
  *
  * Reference: compdat.py deck2dfs + applywelopen (compdat.py:961-991,
  * 791-924). The reference's sequential state machine becomes: schedule
  * dates via window forward-fill (Schedule), defaulted COMPDAT I/J from the
  * as-of WELSPECS header (J9-style as-of join), K1-K2 unroll via
  * explode(sequence) (R1), WELOPEN application as a join + union + last-wins
  * window dedup (R11/W7). All operators are shuffle-keyed on WELL —
  * at corpus scale everything co-partitions by (deck, well).
  */
object Compdat {

  val Cols = Seq("WELL", "I", "J", "K1", "K2", "OP/SH", "SATN", "TRAN",
    "WBDIA", "KH", "SKIN", "DFACT", "DIR", "PEQVR")

  /** Typed COMPDAT records (pre-unroll). */
  def compdatRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "COMPDAT" && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.int(1).as("I"), R.int(2).as("J"),
        R.int(3).as("K1"), R.int(4).as("K2"), R.str(5, "OPEN").as("OP/SH"),
        R.int(6).as("SATN"), R.dbl(7).as("TRAN"), R.dbl(8).as("WBDIA"),
        R.dbl(9).as("KH"), R.dbl(10).as("SKIN"), R.dbl(11).as("DFACT"),
        R.str(12, "Z").as("DIR"), R.dbl(13).as("PEQVR"))

  def welspecsRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "WELSPECS" && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.str(1).as("GROUP"),
        R.int(2).as("HEAD_I"), R.int(3).as("HEAD_J"))

  def welopenRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "WELOPEN" && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.str(1, "OPEN").as("STATUS"),
        R.int(2).as("I"), R.int(3).as("J"), R.int(4).as("K"),
        R.int(5).as("C1"), R.int(6).as("C2"))

  /** Full pipeline from deck text. */
  def df(spark: SparkSession, deckText: String): DataFrame = {
    val events = DeckParser.toDS(spark, deckText).toDF()
    val dates = Schedule.keywordDates(events)
    val compdat0 = compdatRecords(events)
    val welspecs = welspecsRecords(events)

    // Defaulted (null or <=0) I/J inherit the as-of WELSPECS wellhead
    // (reference compdat.py:115-143).
    val headAsof = Ops.asofJoinLe(
      compdat0, welspecs.select(col("WELL"), col("keywordIdx").as("wsIdx"),
        col("HEAD_I"), col("HEAD_J")),
      keys = Seq("WELL"), leftTime = "keywordIdx", rightTime = "wsIdx",
      leftIdCols = Seq("keywordIdx", "recordIdx"), rightCols = Seq("HEAD_I", "HEAD_J"))
      .select(compdat0.columns.map(c => col(s"l.$c")) :+ col("HEAD_I") :+ col("HEAD_J"): _*)
    val withHead = headAsof
      .withColumn("I", when(col("I").isNull || col("I") <= 0, col("HEAD_I")).otherwise(col("I")))
      .withColumn("J", when(col("J").isNull || col("J") <= 0, col("HEAD_J")).otherwise(col("J")))
      .drop("HEAD_I", "HEAD_J")

    // K1-K2 unroll: one row per layer, K1==K2 afterwards (compdat.py:415-470).
    val unrolled = withHead
      .withColumn("K", explode(sequence(col("K1"), col("K2"))))
      .withColumn("K1", col("K")).withColumn("K2", col("K")).drop("K")

    val dated = unrolled.join(dates, Seq("keywordIdx"), "left")
    val welopen = welopenRecords(events).join(dates, Seq("keywordIdx"), "left")
    applyWelopen(dated, welopen)
      .select((Cols :+ "DATE").map(col): _*)
      .orderBy(col("DATE"), col("WELL"), col("I"), col("J"), col("K1"))
  }

  /** WELOPEN → explicit COMPDAT state rows (reference applywelopen,
    * compdat.py:791-924):
    *  - all of I,J,K defaulted/<=0 → acts on the whole well
    *    (STOP→OPEN: stopping the well leaves connections open);
    *  - all of I,J,K given, C1/C2 defaulted → acts on one connection
    *    (STOP→SHUT at connection level); POPN→OPEN always.
    *  - `*`/`?` well templates expand against wells defined earlier in the
    *    deck (compdat.py:366-412).
    * New rows copy the latest prior state per connection with OP/SH
    * replaced, stamped with the WELOPEN's keywordIdx/DATE; final last-wins
    * dedup per (WELL,I,J,K1,K2,DATE) ordered by keyword position.
    */
  def applyWelopen(compdat: DataFrame, welopen: DataFrame): DataFrame = {
    if (welopen.isEmpty) return compdat

    // wildcard well templates → concrete wells known earlier in the deck
    val wellsFirstDef = compdat.groupBy(col("WELL").as("defWell"))
      .agg(min(col("keywordIdx")).as("firstDefIdx"))
    val isTemplate = col("WELL").contains("*") || col("WELL").contains("?")
    val literal = welopen.filter(!isTemplate)
    val expanded = welopen.filter(isTemplate)
      .join(wellsFirstDef,
        regexp_like(col("defWell"), concat(lit("^"),
          regexp_replace(regexp_replace(col("WELL"),
            lit("\\*"), lit(".*")), lit("\\?"), lit(".")), lit("$"))) &&
          col("firstDefIdx") < col("keywordIdx"))
      .drop("WELL").withColumnRenamed("defWell", "WELL").drop("firstDefIdx")
    val wo = literal.unionByName(expanded.select(literal.columns.map(col): _*))
      .withColumn("actsOnWell",
        (col("I").isNull || col("I") <= 0) &&
          (col("J").isNull || col("J") <= 0) &&
          (col("K").isNull || col("K") <= 0))

    val c = compdat.alias("c")
    val w = wo.alias("w")
    val joined = c.join(w,
      col("c.WELL") === col("w.WELL") &&
        col("c.keywordIdx") < col("w.keywordIdx") &&
        (col("w.actsOnWell") ||
          (col("c.I") === col("w.I") && col("c.J") === col("w.J") &&
            col("c.K1") === col("w.K") && col("c.K2") === col("w.K"))))
    // latest prior state per (welopen row, connection)
    val latest = Window
      .partitionBy(col("w.keywordIdx"), col("w.recordIdx"),
        col("c.I"), col("c.J"), col("c.K1"), col("c.K2"))
      .orderBy(col("c.keywordIdx").desc, col("c.recordIdx").desc)
    val newRows = joined
      .withColumn("__rn", row_number().over(latest)).filter(col("__rn") === 1)
      .select(
        col("w.keywordIdx").as("keywordIdx"), col("w.recordIdx").as("recordIdx"),
        col("c.WELL").as("WELL"), col("c.I").as("I"), col("c.J").as("J"),
        col("c.K1").as("K1"), col("c.K2").as("K2"),
        when(col("w.STATUS") === "POPN", "OPEN")
          .when(col("w.STATUS") === "STOP",
            when(col("w.actsOnWell"), "OPEN").otherwise("SHUT"))
          .otherwise(col("w.STATUS")).as("OP/SH"),
        col("c.SATN").as("SATN"), col("c.TRAN").as("TRAN"),
        col("c.WBDIA").as("WBDIA"), col("c.KH").as("KH"),
        col("c.SKIN").as("SKIN"), col("c.DFACT").as("DFACT"),
        col("c.DIR").as("DIR"), col("c.PEQVR").as("PEQVR"),
        col("w.DATE").as("DATE"))

    Ops.lastWinsDedup(
      compdat.unionByName(newRows),
      keys = Seq("WELL", "I", "J", "K1", "K2", "DATE"),
      ord = Seq(col("keywordIdx"), col("recordIdx")))
  }
}
