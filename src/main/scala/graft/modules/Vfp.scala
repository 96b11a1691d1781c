package graft.modules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{DeckParser, Records => R}

/** VFP lift-table extraction: the N-dimensional (THP × WFR × GFR × ALQ ×
  * FLOW) BHP tables flattened to tidy long form.
  *
  * Reference: vfp/_vfpprod.py:201-300 + _vfpcommon stack (R5,
  * vfp/_vfpcommon.py:89-167). The pandas MultiIndex-stack + bfill
  * machinery disappears: axis arrays live as array columns per table,
  * table records look their axis values up positionally (element_at), and
  * the flow dimension is one explode(arrays_zip(flow, tab)) — the long
  * form is generated directly, never via a wide intermediate.
  *
  * Record layout per VFPPROD keyword: record 0 = basic (table number,
  * datum, types/units), 1 = flow axis, 2 = THP axis, 3 = WFR axis,
  * 4 = GFR axis, 5 = ALQ axis, 6+ = (thp_i wfr_i gfr_i alq_i, BHP per
  * flow value). VFPINJ: record 1 = flow axis, 2 = THP axis, 3+ = table.
  */
object Vfp {

  private def darr = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))

  def vfpprod(events: DataFrame, tablenumbers: Seq[Int] = Nil): DataFrame = {
    val vfp = events.filter(col("keyword") === "VFPPROD" && size(col("items")) > 0)
    // type/unit defaults follow the reference (vfp/_vfpprod.py:100-130):
    // no UNITS entry → the DEFAULT unit system; a defaulted/empty ALQ type
    // renders as the literal two-quote string '' like the reference keeps
    val basic0 = vfp.filter(col("recordIdx") === 0)
      .select(col("keywordIdx"), R.int(0).as("TABLE_NUMBER"), R.dbl(1).as("DATUM"),
        R.str(2).as("RATE_TYPE"), R.str(3).as("WFR_TYPE"), R.str(4).as("GFR_TYPE"),
        R.str(5, "THP").as("PRESSURE_TYPE"),
        coalesce(nullif(R.str(6), lit("")), lit("''")).as("ALQ_TYPE"),
        R.str(7, "DEFAULT").as("UNIT_TYPE"), R.str(8, "BHP").as("TAB_TYPE"))
    val basic = if (tablenumbers.isEmpty) basic0
      else basic0.filter(col("TABLE_NUMBER").isin(tablenumbers: _*))
    val axes = vfp.filter(col("recordIdx").between(1, 5))
      .groupBy(col("keywordIdx"))
      .agg(
        max(when(col("recordIdx") === 1, darr(col("items")))).as("flowArr"),
        max(when(col("recordIdx") === 2, darr(col("items")))).as("thpArr"),
        max(when(col("recordIdx") === 3, darr(col("items")))).as("wfrArr"),
        max(when(col("recordIdx") === 4, darr(col("items")))).as("gfrArr"),
        max(when(col("recordIdx") === 5, darr(col("items")))).as("alqArr"))
    val tableRows = vfp.filter(col("recordIdx") >= 6)
      .select(col("keywordIdx"), col("recordIdx"),
        R.int(0).as("THP_IDX"), R.int(1).as("WFR_IDX"),
        R.int(2).as("GFR_IDX"), R.int(3).as("ALQ_IDX"),
        darr(slice(col("items"), lit(5), lit(1000000))).as("tabRow"))
    tableRows
      .join(axes, Seq("keywordIdx"))
      .join(basic, Seq("keywordIdx"))
      .select(col("TABLE_NUMBER"), col("DATUM"), col("RATE_TYPE"), col("WFR_TYPE"),
        col("GFR_TYPE"), col("PRESSURE_TYPE"), col("ALQ_TYPE"), col("UNIT_TYPE"), col("TAB_TYPE"),
        element_at(col("thpArr"), col("THP_IDX")).as("PRESSURE"),
        element_at(col("wfrArr"), col("WFR_IDX")).as("WFR"),
        element_at(col("gfrArr"), col("GFR_IDX")).as("GFR"),
        element_at(col("alqArr"), col("ALQ_IDX")).as("ALQ"),
        explode(arrays_zip(col("flowArr"), col("tabRow"))).as("z"))
      // reference column order (vfp/_vfpprod.py:278-298)
      .select(col("z.flowArr").as("RATE"), col("PRESSURE"), col("WFR"), col("GFR"),
        col("ALQ"), col("z.tabRow").as("TAB"), lit("VFPPROD").as("VFP_TYPE"),
        col("TABLE_NUMBER"), col("DATUM"), col("RATE_TYPE"), col("WFR_TYPE"),
        col("GFR_TYPE"), col("ALQ_TYPE"), col("PRESSURE_TYPE"), col("TAB_TYPE"),
        col("UNIT_TYPE"))
      .orderBy(col("TABLE_NUMBER"), col("PRESSURE"), col("WFR"), col("GFR"),
        col("ALQ"), col("RATE"))
  }

  def vfpinj(events: DataFrame, tablenumbers: Seq[Int] = Nil): DataFrame = {
    val vfp = events.filter(col("keyword") === "VFPINJ" && size(col("items")) > 0)
    val basic0 = vfp.filter(col("recordIdx") === 0)
      .select(col("keywordIdx"), R.int(0).as("TABLE_NUMBER"), R.dbl(1).as("DATUM"),
        R.str(2).as("RATE_TYPE"), R.str(3, "THP").as("PRESSURE_TYPE"),
        R.str(4, "DEFAULT").as("UNIT_TYPE"), R.str(5, "BHP").as("TAB_TYPE"))
    val basic = if (tablenumbers.isEmpty) basic0
      else basic0.filter(col("TABLE_NUMBER").isin(tablenumbers: _*))
    val axes = vfp.filter(col("recordIdx").between(1, 2))
      .groupBy(col("keywordIdx"))
      .agg(
        max(when(col("recordIdx") === 1, darr(col("items")))).as("flowArr"),
        max(when(col("recordIdx") === 2, darr(col("items")))).as("thpArr"))
    val tableRows = vfp.filter(col("recordIdx") >= 3)
      .select(col("keywordIdx"), R.int(0).as("THP_IDX"),
        darr(slice(col("items"), lit(2), lit(1000000))).as("tabRow"))
    tableRows
      .join(axes, Seq("keywordIdx"))
      .join(basic, Seq("keywordIdx"))
      .select(col("TABLE_NUMBER"), col("DATUM"), col("RATE_TYPE"), col("UNIT_TYPE"),
        col("TAB_TYPE"), col("PRESSURE_TYPE"),
        element_at(col("thpArr"), col("THP_IDX")).as("PRESSURE"),
        explode(arrays_zip(col("flowArr"), col("tabRow"))).as("z"))
      // reference column order (vfp/_vfpinj.py stacked form)
      .select(col("z.flowArr").as("RATE"), col("PRESSURE"),
        col("z.tabRow").as("TAB"), lit("VFPINJ").as("VFP_TYPE"),
        col("TABLE_NUMBER"), col("DATUM"), col("RATE_TYPE"),
        col("PRESSURE_TYPE"), col("TAB_TYPE"), col("UNIT_TYPE"))
      .orderBy(col("TABLE_NUMBER"), col("PRESSURE"), col("RATE"))
  }

  /** @param tablenumbers restrict to these TABLE_NUMBERs (the reference's
    *   `vfpnumbers_str` filter, vfp/_vfp.py:436-437) — pruned at the
    *   basic-record stage, before the table explode
    * @param units attach per-axis unit columns from [[VfpDefs]]
    */
  def df(spark: SparkSession, deckText: String,
      tablenumbers: Seq[Int] = Nil, units: Boolean = false): DataFrame = {
    val events = DeckParser.toDS(spark, deckText).toDF()
    val prod = vfpprod(events, tablenumbers)
    val inj = vfpinj(events, tablenumbers)
    val out =
      if (inj.isEmpty) prod
      else if (prod.isEmpty) inj
      else prod.unionByName(inj, allowMissingColumns = true)
    if (units) VfpDefs.withUnits(out) else out
  }
}
