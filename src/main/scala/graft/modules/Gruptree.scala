package graft.modules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ops
import graft.io.{DeckParser, Records => R}

/** Group-tree snapshots: the full production network tree emitted at every
  * date where it changed.
  *
  * Reference: gruptree.py:94-182 — edges accumulate over the deck scan;
  * at each date boundary the *entire* current tree is dumped, stamped with
  * the date in effect when the edges appeared (1900-01-01 if none), with a
  * final last-wins dedup on (DATE, CHILD, KEYWORD).
  *
  * Relational form (R9): edge events stamped with the in-effect date →
  * cross join with the distinct change-dates (snapshot semantics: an edge
  * is visible at every change-date >= its own) → last edge per
  * (date, child, keyword) by keyword position → roots synthesized via
  * anti-join (parents that are nobody's child).
  */
object Gruptree {

  def edgeEvents(events: DataFrame): DataFrame = {
    val grup = events.filter(col("keyword").isin("GRUPTREE", "BRANPROP") && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"), col("keyword").as("KEYWORD"),
        R.str(0).as("CHILD"), R.str(1, "FIELD").as("PARENT"))
    val wspecs = events.filter(col("keyword") === "WELSPECS" && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"), lit("WELSPECS").as("KEYWORD"),
        R.str(0).as("CHILD"), R.str(1).as("PARENT"))
    grup.unionByName(wspecs)
  }

  /** GRUPNET/NODEPROP node-property records (gruptree.py:143-157): per
    * node NAME, last definition wins; merged onto snapshot rows by CHILD.
    */
  def nodeEvents(events: DataFrame): DataFrame =
    events.filter(col("keyword").isin("GRUPNET", "NODEPROP") && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"),
        R.str(0).as("CHILD"), R.dbl(1).as("TERMINAL_PRESSURE"),
        R.int(2).as("VFP_TABLE"), R.dbl(3).as("ALQ"))

  def df(spark: SparkSession, deckText: String): DataFrame = {
    val events = DeckParser.toDS(spark, deckText).toDF()
    val dated = edgeEvents(events)
      .join(Schedule.keywordDates(events), Seq("keywordIdx"), "left")
      .withColumn("DATE", coalesce(col("DATE"), lit("1900-01-01").cast("timestamp")))

    val changeDates = dated.select(col("DATE").as("SNAP_DATE")).distinct()
    // snapshot semantics: each edge is part of every snapshot at or after it
    val visible = dated.join(changeDates, col("DATE") <= col("SNAP_DATE"))
    val lastPerChild = Ops.lastWinsDedup(visible,
      keys = Seq("SNAP_DATE", "CHILD", "KEYWORD"),
      ord = Seq(col("keywordIdx"), col("recordIdx")))
      .select(col("SNAP_DATE").as("DATE"), col("CHILD"), col("PARENT"), col("KEYWORD"))

    // synthesize root rows: parents never appearing as children in the snapshot
    val roots = lastPerChild.select(col("DATE"), col("PARENT").as("CHILD"), col("KEYWORD"))
      .join(lastPerChild.select(col("DATE"), col("CHILD")), Seq("DATE", "CHILD"), "left_anti")
      .filter(col("CHILD").isNotNull)
      .distinct()
      .select(col("DATE"), col("CHILD"), lit(null).cast("string").as("PARENT"),
        lit("GRUPTREE").as("KEYWORD"))

    val tree = lastPerChild.unionByName(roots)

    // attach the latest node properties as of each snapshot (broadcast:
    // node records are deck-sized)
    val nodes = nodeEvents(events)
    val withNodes =
      if (nodes.isEmpty) tree
        .withColumn("TERMINAL_PRESSURE", lit(null).cast("double"))
        .withColumn("VFP_TABLE", lit(null).cast("int"))
        .withColumn("ALQ", lit(null).cast("double"))
      else {
        val lastNode = Ops.lastWinsDedup(nodes, Seq("CHILD"),
          Seq(col("keywordIdx"), col("recordIdx")))
          .select(col("CHILD"), col("TERMINAL_PRESSURE"), col("VFP_TABLE"), col("ALQ"))
        tree.join(broadcast(lastNode), Seq("CHILD"), "left")
      }
    withNodes
      .select(col("DATE"), col("CHILD"), col("PARENT"), col("KEYWORD"),
        col("TERMINAL_PRESSURE"), col("VFP_TABLE"), col("ALQ"))
      .orderBy(col("DATE"), col("PARENT").asc_nulls_first, col("CHILD"))
  }
}
