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
    * LONELYSEG — the segment is ALONE on its SEGBRNO branch
    * (`~SEGBRNO.duplicated`, rft.py:268-269 — the property the ICD split
    * keys on); without a SEGBRNO column it falls back to "no downstream
    * segment";
    * JUNCTION_DOWNSTREAM — the segment this one flows into is a junction.
    */
  def processSegTopology(seg: DataFrame): DataFrame = {
    require(seg.columns.contains("SEGIDX") && seg.columns.contains("SEGNXT"),
      s"Insufficient topology columns (need SEGIDX, SEGNXT): ${seg.columns.mkString(",")}")
    val segCols = seg.columns
    val up = seg.select(segCols.map(c => col(c).as(s"${c}_upstream")).toIndexedSeq: _*)
    // inflow count per segment: how many segments name me as their SEGNXT
    val inflow = seg.groupBy(col("SEGNXT").as("SEGIDX"))
      .agg(count(lit(1)).as("__n_inflow"))
    val junctions = seg.join(inflow, Seq("SEGIDX"))
      .filter(col("__n_inflow") > 1).select(col("SEGIDX").as("__jidx"))
    val merged = seg
      .join(up, col("SEGNXT_upstream") === col("SEGIDX"), "left")
      .join(inflow, Seq("SEGIDX"), "left")
      .withColumn("JUNCTION", coalesce(col("__n_inflow"), lit(0L)) > 1)
      .withColumn("LEAF", coalesce(col("__n_inflow"), lit(0L)) === 0)
      .join(broadcast(junctions), col("SEGNXT") === col("__jidx"), "left")
      .withColumn("JUNCTION_DOWNSTREAM", col("__jidx").isNotNull)
      .drop("__n_inflow", "__jidx")
    // lonely = SEGBRNO not duplicated across the MERGED rows (the
    // reference computes it post-merge, rft.py:268-269)
    val lonely =
      if (segCols.contains("SEGBRNO"))
        count(lit(1)).over(Window.partitionBy(col("SEGBRNO"))) === 1
      else col("SEGNXT").isNull
    merged.withColumn("LONELYSEG", lonely)
  }

  /** Branch count of a (non-ICD) segment table (rft.py:196-216): distinct
    * SEGBRNO among segments that are not leaves or that feed a junction,
    * floored at 1.
    */
  def countWellBranches(seg: DataFrame): Long = {
    val topo = if (seg.columns.contains("LEAF")) seg else processSegTopology(seg)
    math.max(1L, topo.filter(!col("LEAF") || col("JUNCTION_DOWNSTREAM"))
      .select("SEGBRNO").na.drop().distinct().count())
  }

  /** Split segments into (non-ICD, ICD) frames (rft.py:326-373): ICDs are
    * present when branch numbers exceed the true branch count, and an ICD
    * segment is a LEAF alone on its branch. Returns the ICD frame empty
    * when no ICDs are detected or the input is empty (column-compatible
    * either way); columns keep their plain names — [[mergeIcdSegConseg]]
    * applies the `ICD_` prefix when chaining.
    */
  def splitSegIcd(seg: DataFrame): (DataFrame, DataFrame) = {
    val topo = if (seg.columns.contains("LEAF")) seg else processSegTopology(seg)
    // max branch number and true branch count in ONE pass over the
    // (driver-deck-sized) topology lineage
    val stats = topo.agg(
      max(col("SEGBRNO").cast("long")).as("mx"),
      countDistinct(when(!col("LEAF") || col("JUNCTION_DOWNSTREAM"),
        col("SEGBRNO"))).as("branches")).head
    if (stats.isNullAt(0)) (topo, topo.limit(0)) // empty / all-null SEGBRNO
    else if (stats.getLong(0) <= math.max(1L, stats.getLong(1))) (topo, topo.limit(0))
    else (topo.filter(!(col("LEAF") && col("LONELYSEG"))),
      topo.filter(col("LEAF") && col("LONELYSEG")))
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
