package graft.modules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFT multisegment-well topology: segment self-joins and the
  * connection-ICD-segment chain.
  *
  * Reference: rft.py:219-276 (process_seg_topology, J5) and rft.py:376-460
  * (merge_icd_seg_conseg, J6). Segments form a tree via SEGNXT (towards
  * wellhead); the reference's pandas merges become aliased self-joins,
  * and LEAF/JUNCTION flags become windowed counts.
  */
object Rft {

  /** Attach each UPSTREAM segment's row (`_upstream`-suffixed, one output
    * row per inflow — a junction with two inflows appears twice, matching
    * the reference's merge shape at rft.py:219-276 and its
    * test_minimal_branched_well expectations), plus topology flags:
    * JUNCTION — more than one segment flows into this one;
    * LEAF — no segment flows into this one (upstream columns stay null);
    * LONELYSEG — SEGNXT is null/absent (e.g. top segment).
    */
  def processSegTopology(seg: DataFrame): DataFrame = {
    require(seg.columns.contains("SEGIDX") && seg.columns.contains("SEGNXT"),
      s"Insufficient topology columns (need SEGIDX, SEGNXT): ${seg.columns.mkString(",")}")
    val segCols = seg.columns
    val up = seg.select(segCols.map(c => col(c).as(s"${c}_upstream")).toIndexedSeq: _*)
    // inflow count per segment: how many segments name me as their SEGNXT
    val inflow = seg.groupBy(col("SEGNXT").as("SEGIDX"))
      .agg(count(lit(1)).as("__n_inflow"))
    seg
      .join(up, col("SEGNXT_upstream") === col("SEGIDX"), "left")
      .join(inflow, Seq("SEGIDX"), "left")
      .withColumn("JUNCTION", coalesce(col("__n_inflow"), lit(0L)) > 1)
      .withColumn("LEAF", coalesce(col("__n_inflow"), lit(0L)) === 0)
      .withColumn("LONELYSEG", col("SEGNXT").isNull)
      .drop("__n_inflow")
  }

  /** Connection → ICD-segment → branch-segment chain: each connection row
    * joins its ICD segment on CONSEGNO == ICD segment index, then the ICD's
    * downstream segment; connections without an ICD (anti-join remainder)
    * join their segment directly (J6).
    */
  def mergeIcdSegConseg(con: DataFrame, icd: DataFrame, seg: DataFrame): DataFrame = {
    val icdR = icd.select(icd.columns.map(c => col(c).as(s"ICD_$c")).toIndexedSeq: _*)
    val viaIcd = con.join(icdR, col("CONSEGNO") === col("ICD_SEGIDX"), "inner")
      .join(seg, col("ICD_SEGNXT") === col("SEGIDX"), "left")
    val noIcd = con.join(icdR, col("CONSEGNO") === col("ICD_SEGIDX"), "left_anti")
      .join(seg, col("CONSEGNO") === col("SEGIDX"), "left")
    viaIcd.unionByName(noIcd, allowMissingColumns = true)
  }

  /** Per-connection derived quantities (P13, rft.py:463-508): pressure
    * drops, drawdown, measured depth and scaled rates.
    */
  def addDerived(df: DataFrame): DataFrame = {
    val withDp =
      if (df.columns.contains("CONPRES") && df.columns.contains("SEGPRES"))
        df.withColumn("COMPLETION_DP", col("CONPRES") - col("SEGPRES"))
      else df
    if (withDp.columns.contains("PRESSURE") && withDp.columns.contains("CONPRES"))
      withDp.withColumn("DRAWDOWN",
        when(col("CONPRES") > 0, col("PRESSURE") - col("CONPRES")).otherwise(0.0))
    else withDp
  }
}
