package graft.modules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFT multisegment-well topology: segment self-joins and the
  * connection-ICD-segment chain.
  *
  * Reference: rft.py:219-276 (process_seg_topology, J5) and rft.py:376-460
  * (merge_icd_seg_conseg, J6). Segments form a tree via SEGNXT (towards
  * wellhead); the reference's pandas merges become aliased self-joins,
  * and LEAF/JUNCTION flags become windowed counts.
  *
  * Every entry point takes an optional `keys` list (e.g.
  * `Seq("WELL", "DATE")`): the reference loops one well-report at a time,
  * while here the same plan runs corpus-native — all self-joins and
  * windows are scoped to the key columns, so a fleet of wells resolves in
  * one shuffle per operator instead of a driver loop. Right-side key
  * columns are renamed (`__up_`/`__j_`/`__icd_`/`__seg_` prefixes) before
  * each join: the frames share lineage, and renamed keys sidestep
  * self-join attribute ambiguity entirely.
  */
object Rft {

  /** `left.k <=> prefixed right.k` conjunction ending in `rest`. */
  private def keyCond(keys: Seq[String], prefix: String, rest: Column): Column =
    keys.map(k => col(k) <=> col(s"$prefix$k")).foldRight(rest)(_ && _)

  private def dropPrefixed(df: DataFrame, keys: Seq[String], prefix: String): DataFrame =
    df.drop(keys.map(k => s"$prefix$k").toIndexedSeq: _*)

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
  def processSegTopology(seg: DataFrame, keys: Seq[String] = Nil): DataFrame = {
    require(seg.columns.contains("SEGIDX") && seg.columns.contains("SEGNXT"),
      s"Insufficient topology columns (need SEGIDX, SEGNXT): ${seg.columns.mkString(",")}")
    val dataCols = seg.columns.filterNot(keys.contains)
    val up = seg.select((keys.map(k => col(k).as(s"__up_$k")) ++
      dataCols.map(c => col(c).as(s"${c}_upstream"))).toIndexedSeq: _*)
    // inflow count per segment: how many segments name me as their SEGNXT
    val inflow = seg.select((keys.map(col) :+ col("SEGNXT").as("SEGIDX")).toIndexedSeq: _*)
      .groupBy((keys :+ "SEGIDX").map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__n_inflow"))
    val junctions0 = inflow.filter(col("__n_inflow") > 1)
      .select((keys.map(k => col(k).as(s"__j_$k")) :+
        col("SEGIDX").as("__jidx")).toIndexedSeq: _*)
    // single-well calls broadcast the (tiny) junction list; corpus-keyed
    // calls leave the strategy to AQE — one junction row per well adds up
    val junctions = if (keys.isEmpty) broadcast(junctions0) else junctions0
    val merged = dropPrefixed(
      seg.join(up, keyCond(keys, "__up_",
        col("SEGNXT_upstream") === col("SEGIDX")), "left"), keys, "__up_")
      .join(inflow, (keys :+ "SEGIDX").toIndexedSeq, "left")
      .withColumn("JUNCTION", coalesce(col("__n_inflow"), lit(0L)) > 1)
      .withColumn("LEAF", coalesce(col("__n_inflow"), lit(0L)) === 0)
    val jJoined = dropPrefixed(
      merged.join(junctions, keyCond(keys, "__j_",
        col("SEGNXT") === col("__jidx")), "left"), keys, "__j_")
      .withColumn("JUNCTION_DOWNSTREAM", col("__jidx").isNotNull)
      .drop("__n_inflow", "__jidx")
    // lonely = SEGBRNO not duplicated across the MERGED rows (the
    // reference computes it post-merge, rft.py:268-269)
    val lonely =
      if (dataCols.contains("SEGBRNO"))
        count(lit(1)).over(
          Window.partitionBy((keys :+ "SEGBRNO").map(col).toIndexedSeq: _*)) === 1
      else col("SEGNXT").isNull
    jJoined.withColumn("LONELYSEG", lonely)
  }

  /** Branch count of a (non-ICD) single-well segment table (rft.py:196-216):
    * distinct SEGBRNO among segments that are not leaves or that feed a
    * junction, floored at 1.
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
    * applies the `ICD_` prefix when chaining. With `keys`, ICD presence is
    * decided PER KEY (per well-report) via window aggregates — no
    * driver-side action, so the split stays one corpus-wide plan.
    */
  def splitSegIcd(seg: DataFrame, keys: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val topo = if (seg.columns.contains("LEAF")) seg
      else processSegTopology(seg, keys)
    // per-key max branch number and true branch count as window aggregates
    // over the (well-report-sized) key partition — segments per well are
    // dozens, so the collect_set stays tiny at any corpus scale
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
    val branches = greatest(lit(1L),
      size(collect_set(when(!col("LEAF") || col("JUNCTION_DOWNSTREAM"),
        col("SEGBRNO"))).over(w)).cast("long"))
    val icdPresent = coalesce(
      max(col("SEGBRNO").cast("long")).over(w) > branches, lit(false))
    val flagged = topo.withColumn("__icd",
      icdPresent && col("LEAF") && col("LONELYSEG"))
    (flagged.filter(!col("__icd")).drop("__icd"),
      flagged.filter(col("__icd")).drop("__icd"))
  }

  /** Connection → ICD-segment → branch-segment chain (rft.py:376-460):
    * each connection row joins its ICD segment on CONSEGNO == ICD segment
    * index, then the ICD's downstream segment; rows the junction-expanded
    * topology duplicated are filtered back to the one whose upstream IS
    * the ICD (`CONSEGNO == SEGIDX_upstream`, rft.py:434-436 — ICD-fed
    * junctions are legit and would otherwise double rows). Connections
    * without an ICD (anti-join remainder) join their segment directly
    * (inner, matching the reference's default merge at rft.py:448-451).
    */
  def mergeIcdSegConseg(con: DataFrame, icd: DataFrame, seg: DataFrame,
      keys: Seq[String] = Nil): DataFrame = {
    val icdR = icd.select((keys.map(k => col(k).as(s"__icd_$k")) ++
      icd.columns.filterNot(keys.contains)
        .map(c => col(c).as(s"ICD_$c"))).toIndexedSeq: _*)
    val segR = seg.select((keys.map(k => col(k).as(s"__seg_$k")) ++
      seg.columns.filterNot(keys.contains).map(col)).toIndexedSeq: _*)
    val onIcd = keyCond(keys, "__icd_", col("CONSEGNO") === col("ICD_SEGIDX"))
    val viaIcd1 = dropPrefixed(
      dropPrefixed(con.join(icdR, onIcd, "inner"), keys, "__icd_")
        .join(segR, keyCond(keys, "__seg_",
          col("ICD_SEGNXT") === col("SEGIDX")), "left"), keys, "__seg_")
    val viaIcd =
      if (seg.columns.contains("SEGIDX_upstream"))
        viaIcd1.filter(col("CONSEGNO") === col("SEGIDX_upstream"))
      else viaIcd1
    val noIcd = dropPrefixed(
      con.join(icdR, onIcd, "left_anti")
        .join(segR, keyCond(keys, "__seg_",
          col("CONSEGNO") === col("SEGIDX")), "inner"), keys, "__seg_")
    viaIcd.unionByName(noIcd, allowMissingColumns = true)
  }

  /** Per-connection derived quantities (P13, rft.py add_extras:463-508):
    * pressure drops (zero-guarded like the reference: COMPLETION_DP only
    * where BOTH pressures are positive, else 0.0), drawdown (0.0 default
    * — the reference materializes the column on any non-empty frame;
    * here it is schema-stable and always present), the CONBPRES alias,
    * measured depth + length from the [CONLENST, CONLENEN] interval, and
    * the per-length scaled rates.
    */
  def addDerived(df: DataFrame): DataFrame = {
    val has = df.columns.toSet
    val withDp =
      if (has("CONPRES") && has("SEGPRES"))
        df.withColumn("COMPLETION_DP",
          when(col("CONPRES") > 0 && col("SEGPRES") > 0,
            col("CONPRES") - col("SEGPRES")).otherwise(0.0))
      else df
    val withDraw = withDp.withColumn("DRAWDOWN",
      if (has("PRESSURE") && has("CONPRES"))
        when(col("CONPRES") > 0, col("PRESSURE") - col("CONPRES")).otherwise(0.0)
      else lit(0.0))
    val withAlias =
      if (has("PRESSURE")) withDraw.withColumn("CONBPRES", col("PRESSURE"))
      else withDraw
    val withLen =
      if (has("CONLENST") && has("CONLENEN"))
        withAlias
          .withColumn("CONMD", lit(0.5) * (col("CONLENST") + col("CONLENEN")))
          .withColumn("CONLENTH", col("CONLENEN") - col("CONLENST"))
      else withAlias
    Seq("CONORAT", "CONWRAT", "CONGRAT").foldLeft(withLen) { (d, c) =>
      if (has(c) && d.columns.contains("CONLENTH"))
        // Spark's Divide returns NULL on a 0.0 divisor where IEEE (and
        // the pandas reference, rft.py:502-507) give ±inf/NaN — mirror
        // IEEE explicitly: rate × (+inf) is +inf/−inf/NaN by the rate's
        // sign, exactly rate/0.0
        d.withColumn(c + "S",
          when(col("CONLENTH") === 0.0, col(c) * lit(Double.PositiveInfinity))
            .otherwise(col(c) / col("CONLENTH")))
      else d
    }
  }
}
