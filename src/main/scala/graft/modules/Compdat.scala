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
  * window dedup (R11/W7).
  *
  * CORPUS-NATIVE: every as-of join, wildcard expansion, WLIST fold and
  * last-wins window is keyed on `(deckId, WELL)` when the event frame
  * carries a `deckId` column (the eclipse-deck source always emits one), so
  * ONE frame holding a fleet of decks processes each deck's state machine
  * independently — the reference's per-deck semantics (compdat.py:791-924)
  * at 1000-deck scale without a driver loop. [[fromEvents]] with
  * `keepDeckId = true` is the corpus entry point; the default keeps the
  * reference's single-deck output schema (and fails fast on multi-deck
  * input, since dropping the deck key there would silently interleave
  * unrelated wells).
  */
object Compdat {

  val Cols = Seq("WELL", "I", "J", "K1", "K2", "OP/SH", "SATN", "TRAN",
    "WBDIA", "KH", "SKIN", "DFACT", "DIR", "PEQVR")

  /** The corpus key columns ([[Schedule.deckKeys]]). Appended LAST in
    * record frames so single-deck positional access is unchanged.
    */
  private def deckCols(df: DataFrame): Seq[String] = Schedule.deckKeys(df)

  private def withDeck(df: DataFrame, cols: Seq[Column]): Seq[Column] =
    cols ++ deckCols(df).map(col)

  /** Typed COMPDAT records (pre-unroll). */
  def compdatRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "COMPDAT" && size(col("items")) > 0)
      .select(withDeck(events, Seq(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.int(1).as("I"), R.int(2).as("J"),
        R.int(3).as("K1"), R.int(4).as("K2"), R.str(5, "OPEN").as("OP/SH"),
        // defaulted items carry the opm schema defaults exactly like the
        // reference's deck view (opmkeywords/COMPDAT: SAT_TABLE 0, Kh -1,
        // SKIN 0 — visible in the reference's published compdat.csv);
        // TRAN/WBDIA/DFACT/PEQVR have no schema default and stay null
        R.int(6, 0).as("SATN"), R.dbl(7).as("TRAN"), R.dbl(8).as("WBDIA"),
        R.dbl(9, -1.0).as("KH"), R.dbl(10, 0.0).as("SKIN"), R.dbl(11).as("DFACT"),
        R.str(12, "Z").as("DIR"), R.dbl(13).as("PEQVR"))): _*)

  def welspecsRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "WELSPECS" && size(col("items")) > 0)
      .select(withDeck(events, Seq(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.str(1).as("GROUP"),
        R.int(2).as("HEAD_I"), R.int(3).as("HEAD_J"))): _*)

  def welopenRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "WELOPEN" && size(col("items")) > 0)
      .select(withDeck(events, Seq(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.str(1, "OPEN").as("STATUS"),
        R.int(2).as("I"), R.int(3).as("J"), R.int(4).as("K"),
        R.int(5).as("C1"), R.int(6).as("C2"))): _*)

  def wlistRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "WLIST" && size(col("items")) > 0)
      .select(withDeck(events, Seq(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("NAME"), R.str(1).as("ACTION"), R.rest(2).as("WELLS"))): _*)

  def complumpRecords(events: DataFrame): DataFrame =
    events.filter(col("keyword") === "COMPLUMP" && size(col("items")) > 0)
      .select(withDeck(events, Seq(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("WELL"), R.int(1).as("I"), R.int(2).as("J"),
        R.int(3).as("K1"), R.int(4).as("K2"), R.int(5).as("N"))): _*)

  /** WLIST action algebra (R8, expand_wlist compdat.py:517-653): NEW
    * replaces a list, ADD unions, DEL removes, MOV adds here and removes
    * from every other list OF THE SAME DECK; `*LIST` references inside the
    * well items resolve against the current per-deck state. Emitted as NEW
    * snapshots per action record. The fold is inherently sequential
    * small-state but the state is PER DECK by construction (MOV never
    * crosses decks), so corpus mode runs it as a `groupByKey(deckId)` +
    * `flatMapGroups` ordered fold — one task per deck, no driver collect,
    * state bounded by one deck's WLIST records. SURVEY §2.7's driver-fold
    * prescription is the single-deck degenerate case (one group).
    */
  def expandWlist(wlist: DataFrame): DataFrame = {
    val spark = wlist.sparkSession
    import spark.implicits._
    val hadDeck = deckCols(wlist).nonEmpty
    val base = if (hadDeck) wlist else wlist.withColumn("deckId", lit(""))
    val out = base
      .select(col("deckId"), col("keywordIdx"), col("recordIdx"),
        col("NAME"), col("ACTION"), col("WELLS"))
      .as[(String, Int, Int, String, String, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroups { (deck, it) =>
        // deck-sized: sort this deck's action records in task memory
        val recs = it.toArray.sortBy(r => (r._2, r._3))
        var state = Map.empty[String, Vector[String]]
        recs.iterator.map { case (_, kwIdx, recIdx, name, action, rawWells) =>
          val wells = rawWells.flatMap { w =>
            if (w.startsWith("*")) state.getOrElse(w, Vector.empty) else Vector(w)
          }.toVector
          action match {
            case "NEW" => state += name -> wells.distinct.sorted
            case "ADD" => state += name ->
              (state.getOrElse(name, Vector.empty) ++ wells).distinct.sorted
            case "DEL" => state += name ->
              state.getOrElse(name, Vector.empty).filterNot(wells.contains)
            case "MOV" =>
              state = state.map { case (n, ws) => n -> ws.filterNot(wells.contains) }
              state += name ->
                (state.getOrElse(name, Vector.empty) ++ wells).distinct.sorted
            case other => throw new IllegalArgumentException(s"WLIST action $other")
          }
          (kwIdx, recIdx, name, state(name): Seq[String], deck)
        }
      }
    val df = out.toDF("keywordIdx", "recordIdx", "NAME", "WELLS", "deckId")
    if (hadDeck) df else df.drop("deckId")
  }

  /** Full pipeline from a deck file via the eclipse-deck DSv2 source
    * (one input partition per deck file).
    */
  def dfFromPath(spark: SparkSession, path: String): DataFrame =
    fromEvents(spark.read.format("eclipse-deck").load(path))

  /** FLEET entry: one multi-deck frame from a glob/directory of deck
    * files — every state operator keyed on (deckId, …), output carries
    * the deck key. The 100 TB shape: 10⁵ decks = 10⁵ input partitions
    * through ONE plan.
    */
  def corpusFromPath(spark: SparkSession, paths: String*): DataFrame =
    fromEvents(spark.read.format("eclipse-deck").load(paths: _*), keepDeckId = true)

  /** Full pipeline from deck text. */
  def df(spark: SparkSession, deckText: String): DataFrame =
    fromEvents(DeckParser.toDS(spark, deckText).toDF())

  def fromEvents(events: DataFrame): DataFrame =
    fromEvents(events, keepDeckId = false)

  /** `keepDeckId = true` is corpus mode: the output carries `deckId` and a
    * multi-deck frame yields, per deck, exactly what a single-deck run
    * yields — all state operators below key on (deckId, WELL). The default
    * drops the column for reference-schema parity and therefore refuses
    * multi-deck input.
    */
  def fromEvents(events: DataFrame, keepDeckId: Boolean): DataFrame = {
    if (!keepDeckId) Schedule.requireSingleDeck(events, "compdat")
    val dk = deckCols(events)
    val dates = Schedule.keywordDates(events, keepDeckId = dk.nonEmpty)
    val compdat0 = compdatRecords(events)
    val welspecs = welspecsRecords(events)
    val welopenRecs = welopenRecords(events)

    // ONE bounded driver action over the RAW record frame decides which
    // WELOPEN expansion stages this corpus needs — replacing four isEmpty
    // probes that each executed a progressively longer join/window
    // lineage. The flags are computable on raw records because resolve
    // steps never create list/C/partial rows: *LIST explode keeps I/J/K,
    // and COMPLUMP rewrite sets all three (never partial afterwards).
    def dflt(c: Column) = c.isNull || c <= 0
    val nDef = when(dflt(col("I")), 1).otherwise(0) +
      when(dflt(col("J")), 1).otherwise(0) +
      when(dflt(col("K")), 1).otherwise(0)
    val rawHasC = coalesce(col("C1"), lit(0)) > 0 || coalesce(col("C2"), lit(0)) > 0
    val feat = welopenRecs.agg(
      count(lit(1)).as("n"),
      count(when(col("WELL").startsWith("*"), 1)).as("nList"),
      count(when(rawHasC, 1)).as("nC"),
      count(when(!rawHasC && nDef > 0 && nDef < 3, 1)).as("nPartial")).head()
    val (hasWelopen, hasList, hasC) =
      (feat.getLong(0) > 0, feat.getLong(1) > 0, feat.getLong(2) > 0)
    // C rows can BECOME partial during resolve (a COMPLUMP record with
    // defaulted I/J rewrites them to null coordinates), so any C row
    // forces the partial-expansion stage too — running it over zero
    // partial rows is a correct no-op, skipping it over one is not
    val hasPartial = feat.getLong(3) > 0 || hasC

    // Defaulted (null or <=0) I/J inherit the as-of WELSPECS wellhead
    // (reference compdat.py:115-143).
    val headAsof = Ops.asofJoinLe(
      compdat0, welspecs.select(withDeck(welspecs, Seq(col("WELL"),
        col("keywordIdx").as("wsIdx"), col("HEAD_I"), col("HEAD_J"))): _*),
      keys = dk :+ "WELL", leftTime = "keywordIdx", rightTime = "wsIdx",
      leftIdCols = dk ++ Seq("keywordIdx", "recordIdx"),
      rightCols = Seq("HEAD_I", "HEAD_J"))
      .select(compdat0.columns.map(c => col(s"l.$c")) :+ col("HEAD_I") :+ col("HEAD_J"): _*)
    val withHead = headAsof
      .withColumn("I", when(col("I").isNull || col("I") <= 0, col("HEAD_I")).otherwise(col("I")))
      .withColumn("J", when(col("J").isNull || col("J") <= 0, col("HEAD_J")).otherwise(col("J")))
      .drop("HEAD_I", "HEAD_J")

    // K1-K2 unroll: one row per layer, K1==K2 afterwards (compdat.py:415-470).
    val unrolled = withHead
      .withColumn("K", explode(sequence(col("K1"), col("K2"))))
      .withColumn("K1", col("K")).withColumn("K2", col("K")).drop("K")

    val dated = unrolled.join(dates, dk :+ "keywordIdx", "left")
    val welopenRaw = welopenRecs.join(dates, dk :+ "keywordIdx", "left")
    val welopen = expandWelopenDefaults(
      resolveWelopen(welopenRaw,
        expandWlist(wlistRecords(events)), complumpRecords(events),
        doList = Some(hasList), doC = Some(hasC)),
      dated, doPartial = Some(hasPartial))
    val outCols = (if (keepDeckId) dk else Nil) ++ Cols :+ "DATE"
    applyWelopen(dated, welopen, nonEmpty = Some(hasWelopen))
      .select(outCols.map(col): _*)
      .orderBy(((if (keepDeckId) dk else Nil) ++
        Seq("DATE", "WELL", "I", "J", "K1")).map(col): _*)
  }

  /** Resolve indirections in WELOPEN rows before state application:
    * `*NAME` well entries → the as-of WLIST snapshot's wells (J12,
    * compdat.py:757-788); C1/C2 completion ranges → the as-of COMPLUMP
    * lump assignments' explicit (I,J,K) connections (J11,
    * compdat.py:656-754). Both are as-of joins on the keyword ordinal
    * against dimension-sized state tables → broadcast; both match within
    * the owning deck on a corpus frame.
    */
  def resolveWelopen(welopen: DataFrame, wlistSnaps: DataFrame,
      complump: DataFrame, doList: Option[Boolean] = None,
      doC: Option[Boolean] = None): DataFrame = {
    val dk = deckCols(welopen)
    val outCols = welopen.columns.toSeq
    val isList = col("WELL").startsWith("*")
    val afterList = {
      lazy val lists = welopen.filter(isList)
      if (!doList.getOrElse(!lists.isEmpty)) welopen
      else {
        val s = wlistSnaps.select(Seq(col("NAME"), col("keywordIdx").as("snapIdx"),
          col("recordIdx").as("snapRec"), col("WELLS")) ++
          dk.map(c => col(c).as("snapDeck")): _*)
        val deckMatch = dk.map(_ => col("snapDeck") === col("deckId"))
        val joined = lists.join(broadcast(s),
          deckMatch.foldLeft(col("NAME") === col("WELL") &&
            col("snapIdx") <= col("keywordIdx"))(_ && _))
        val w = Window
          .partitionBy((dk :+ "keywordIdx" :+ "recordIdx").map(col): _*)
          .orderBy(col("snapIdx").desc, col("snapRec").desc)
        val exploded = joined
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .withColumn("WELL", explode(col("WELLS")))
          .select(outCols.map(col): _*)
        welopen.filter(!isList).unionByName(exploded)
      }
    }
    // explicit 0 / negative completion numbers are defaults, same as 1*
    // (reference zero/negative-values cases): only a positive C1 or C2
    // names a real completion range. coalesce keeps the predicate
    // two-valued so !hasC doesn't drop both-null rows. A half-given range
    // (one bound positive, the other 0/defaulted) collapses to the given
    // bound — the reference raises "Zeros for C1/C2 is not implemented"
    // here; the engine generalizes instead of failing the job.
    val c1p = when(col("C1") > 0, col("C1"))
    val c2p = when(col("C2") > 0, col("C2"))
    val hasC = coalesce(col("C1"), lit(0)) > 0 || coalesce(col("C2"), lit(0)) > 0
    val cRows = afterList.filter(hasC)
    if (!doC.getOrElse(!cRows.isEmpty)) afterList
    else {
      val cl = complump
        .withColumn("CL_K", explode(sequence(col("K1"), col("K2"))))
        .select(Seq(col("WELL"), col("I").as("CL_I"), col("J").as("CL_J"),
          col("CL_K"), col("N"),
          col("keywordIdx").as("clIdx"), col("recordIdx").as("clRec")) ++
          dk.map(c => col(c).as("clDeck")): _*)
      val deckMatch = dk.map(_ => cRows("deckId") === cl("clDeck"))
      val joined = cRows.drop("I", "J", "K").join(broadcast(cl),
        deckMatch.foldLeft(cRows("WELL") === cl("WELL") &&
          col("clIdx") <= col("keywordIdx") &&
          col("N").between(coalesce(c1p, c2p), coalesce(c2p, c1p)))(_ && _))
        .drop(cl("WELL"))
      // latest lump assignment per (welopen row, WELL, connection) —
      // *LIST-expanded rows share (keywordIdx, recordIdx) across wells
      val w = Window
        .partitionBy((dk :+ "keywordIdx" :+ "recordIdx").map(col) ++
          Seq(col("WELL"), col("CL_I"), col("CL_J"), col("CL_K")): _*)
        .orderBy(col("clIdx").desc, col("clRec").desc)
      val expanded = joined
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .withColumn("I", col("CL_I")).withColumn("J", col("CL_J"))
        .withColumn("K", col("CL_K"))
        .withColumn("C1", lit(null).cast("int")).withColumn("C2", lit(null).cast("int"))
        .select(outCols.map(col): _*)
      afterList.filter(!hasC).unionByName(expanded)
    }
  }

  /** Partially-defaulted WELOPEN coordinates (J9, expand_welopen_defaults
    * compdat.py:291-363): a row giving some but not all of I/J/K expands
    * against the as-of COMPDAT connections matching the given coordinates,
    * yielding explicit per-connection rows. Fully-defaulted rows stay
    * (acts-on-well); fully-given rows stay (single connection).
    */
  def expandWelopenDefaults(welopen: DataFrame, compdat: DataFrame,
      doPartial: Option[Boolean] = None): DataFrame = {
    def dflt(c: Column) = c.isNull || c <= 0
    val nDefaulted =
      when(dflt(col("I")), 1).otherwise(0) +
        when(dflt(col("J")), 1).otherwise(0) +
        when(dflt(col("K")), 1).otherwise(0)
    val isPartial = nDefaulted > 0 && nDefaulted < 3
    val partial = welopen.filter(isPartial)
    if (!doPartial.getOrElse(!partial.isEmpty)) return welopen
    val dk = deckCols(welopen)
    val outCols = welopen.columns.toSeq
    val conns = compdat.select(Seq(col("WELL").as("cWELL"), col("keywordIdx").as("cIdx"),
      col("recordIdx").as("cRec"), col("I").as("cI"), col("J").as("cJ"),
      col("K1").as("cK")) ++ dk.map(c => col(c).as("cDeck")): _*)
    val deckMatch = dk.map(_ => col("cDeck") === col("deckId"))
    val joined = partial.join(conns,
      deckMatch.foldLeft(col("cWELL") === col("WELL") &&
        col("cIdx") < col("keywordIdx") &&
        (dflt(col("I")) || col("I") === col("cI")) &&
        (dflt(col("J")) || col("J") === col("cJ")) &&
        (dflt(col("K")) || col("K") === col("cK")))(_ && _))
    // one expansion per distinct matching connection per (welopen row,
    // WELL) — *LIST-expanded rows share (keywordIdx, recordIdx) across
    // wells, so the well key must partition too
    val w = Window
      .partitionBy((dk :+ "keywordIdx" :+ "recordIdx").map(col) ++
        Seq(col("WELL"), col("cI"), col("cJ"), col("cK")): _*)
      .orderBy(col("cIdx").desc, col("cRec").desc)
    val expanded = joined
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .withColumn("I", col("cI")).withColumn("J", col("cJ")).withColumn("K", col("cK"))
      .select(outCols.map(col): _*)
    welopen.filter(!isPartial).unionByName(expanded)
  }

  /** WELOPEN → explicit COMPDAT state rows (reference applywelopen,
    * compdat.py:791-924):
    *  - all of I,J,K defaulted/<=0 → acts on the whole well
    *    (STOP→OPEN: stopping the well leaves connections open);
    *  - all of I,J,K given, C1/C2 defaulted → acts on one connection
    *    (STOP→SHUT at connection level); POPN→OPEN always.
    *  - `*`/`?` well templates expand against wells defined earlier in the
    *    SAME deck (compdat.py:366-412).
    * New rows copy the latest prior state per connection with OP/SH
    * replaced, stamped with the WELOPEN's keywordIdx/DATE; final last-wins
    * dedup per (deckId?, WELL,I,J,K1,K2,DATE) ordered by keyword position.
    */
  def applyWelopen(compdat: DataFrame, welopen: DataFrame,
      nonEmpty: Option[Boolean] = None): DataFrame = {
    if (!nonEmpty.getOrElse(!welopen.isEmpty)) return compdat
    val dk = deckCols(compdat)
    // single-key contract (Schedule.deckKeys): the defDeck alias below
    // would silently collapse multiple keys into one column
    require(dk.size <= 1, s"deck key must be a single column, got $dk")

    // wildcard well templates → concrete wells known earlier in the deck
    val wellsFirstDef = compdat
      .groupBy(dk.map(c => col(c).as("defDeck")) :+ col("WELL").as("defWell"): _*)
      .agg(min(col("keywordIdx")).as("firstDefIdx"))
    val isTemplate = col("WELL").contains("*") || col("WELL").contains("?")
    val literal = welopen.filter(!isTemplate)
    val deckMatch = dk.map(_ => col("defDeck") === col("deckId"))
    val expanded = welopen.filter(isTemplate)
      .join(wellsFirstDef,
        deckMatch.foldLeft(
          regexp_like(col("defWell"), concat(lit("^"),
            regexp_replace(regexp_replace(col("WELL"),
              lit("\\*"), lit(".*")), lit("\\?"), lit(".")), lit("$"))) &&
            col("firstDefIdx") < col("keywordIdx"))(_ && _))
      .drop("WELL").withColumnRenamed("defWell", "WELL")
      .drop("firstDefIdx").drop("defDeck")
    val wo = literal.unionByName(expanded.select(literal.columns.map(col): _*))
      .withColumn("actsOnWell",
        (col("I").isNull || col("I") <= 0) &&
          (col("J").isNull || col("J") <= 0) &&
          (col("K").isNull || col("K") <= 0))

    val c = compdat.alias("c")
    val w = wo.alias("w")
    val deckMatchCW = dk.map(k => col(s"c.$k") === col(s"w.$k"))
    val joined = c.join(w,
      deckMatchCW.foldLeft(col("c.WELL") === col("w.WELL") &&
        col("c.keywordIdx") < col("w.keywordIdx") &&
        (col("w.actsOnWell") ||
          (col("c.I") === col("w.I") && col("c.J") === col("w.J") &&
            col("c.K1") === col("w.K") && col("c.K2") === col("w.K"))))(_ && _))
    // latest prior state per (welopen row, WELL, connection) — the WELL
    // must be in the partition: one wildcard/*LIST record expands to
    // several wells SHARING (keywordIdx, recordIdx), and two wells'
    // connections at equal coordinates must not collapse to one row
    val latest = Window
      .partitionBy(dk.map(k => col(s"w.$k")) ++
        Seq(col("w.keywordIdx"), col("w.recordIdx"), col("c.WELL"),
          col("c.I"), col("c.J"), col("c.K1"), col("c.K2")): _*)
      .orderBy(col("c.keywordIdx").desc, col("c.recordIdx").desc)
    val newRows = joined
      .withColumn("__rn", row_number().over(latest)).filter(col("__rn") === 1)
      .select(dk.map(k => col(s"c.$k").as(k)) ++ Seq(
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
        col("w.DATE").as("DATE")): _*)

    Ops.lastWinsDedup(
      compdat.unionByName(newRows),
      keys = dk ++ Seq("WELL", "I", "J", "K1", "K2", "DATE"),
      ord = Seq(col("keywordIdx"), col("recordIdx")))
  }

  /** WELOPEN validation report: resolved WELOPEN rows that matched NO prior
    * COMPDAT connection. The reference raises ValueError for these ("No
    * connections are matching WELOPEN keyword", "not acting on any
    * existing well"); a distributed engine must not fail a whole corpus on
    * one bad record, so the anomalies surface as data — the caller decides
    * whether they are fatal. Same join shape as applyWelopen, anti-form.
    */
  def welopenAnomalies(compdat: DataFrame, welopen: DataFrame): DataFrame = {
    val dk = deckCols(welopen).intersect(deckCols(compdat))
    val wo = welopen.withColumn("actsOnWell",
      (col("I").isNull || col("I") <= 0) &&
        (col("J").isNull || col("J") <= 0) &&
        (col("K").isNull || col("K") <= 0))
    val c = compdat.select(Seq(col("WELL").as("cWELL"), col("keywordIdx").as("cIdx"),
      col("I").as("cI"), col("J").as("cJ"), col("K1").as("cK1"),
      col("K2").as("cK2")) ++ dk.map(k => col(k).as("cDeck")): _*)
    val deckMatch = dk.map(_ => col("cDeck") === col("deckId"))
    wo.join(c,
        deckMatch.foldLeft(col("cWELL") === col("WELL") &&
          col("cIdx") < col("keywordIdx") &&
          (col("actsOnWell") ||
            (col("cI") === col("I") && col("cJ") === col("J") &&
              col("cK1") === col("K") && col("cK2") === col("K"))))(_ && _),
        "left_anti")
      .drop("actsOnWell")
  }
}
