package graft.modules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pillar module: per-(I,J) column statistics + fluid contacts, composing
  * the GridOps operators exactly as the reference's pillars.df()
  * (pillars.py:38-141, 260-309) chains its steps:
  * region-optional grouping, volume rollups, saturation-cutoff contact
  * depths inner-joined back to eligible pillars, optional DATE stacking
  * (the restart frame already carries DATE — R4, never a `@date` wide
  * form).
  */
object Pillars {

  /** Pillar statistics + contacts with the reference's exact semantics
    * (pillars.py:38-141 df + pillars.py:192-318 compute_pillar_contacts):
    * pillar PORO is PORE-VOLUME-weighted (PORV/VOLUME after aggregation,
    * not an unweighted cell mean); OWC is the deepest cell with
    * SOIL > soilCutoff among pillars holding water somewhere
    * (SWAT > swatCutoff); three-phase GOC is the deepest cell with
    * SGAS > sgasCutoff that still carries a minute oil saturation
    * (SOIL > 0.01 — so gas injected into the water leg is not read as a
    * contact), among pillars with any such oil; gas-water runs
    * (`gasWater = true`, no SOIL) get GWC instead, eligibility-filtered
    * on the water pillars. SOIL is derived as 1 − SWAT [− SGAS] when not
    * supplied.
    *
    * @param grid cell frame with I, J, X, Y, Z, VOLUME [, PORV, PERM*,
    *             SWAT, SGAS, SOIL, DATE]
    * @param region optional region column name (e.g. EQLNUM/FIPNUM) to
    *               include in the pillar key
    */
  def df(grid: DataFrame, region: Option[String] = None,
      soilCutoff: Double = 0.2, sgasCutoff: Double = 0.7,
      swatCutoff: Double = 0.7, gasWater: Boolean = false): DataFrame = {
    val keyCols = Seq("PILLAR") ++ region.filter(grid.columns.contains) ++
      (if (grid.columns.contains("DATE")) Seq("DATE") else Nil)
    val g0 = grid.withColumn("PILLAR", concat_ws("-", col("I"), col("J")))
    val withPillar =
      if (g0.columns.contains("SOIL") || gasWater || !grid.columns.contains("SWAT")) g0
      else g0.withColumn("SOIL", lit(1.0) - col("SWAT") -
        (if (grid.columns.contains("SGAS")) col("SGAS") else lit(0.0)))

    val sums = Seq("VOLUME", "PORV").filter(grid.columns.contains)
    val means = Seq("X", "Y", "Z", "PERMX", "PERMY", "PERMZ", "PORO")
      .filter(grid.columns.contains)
    val stats0 = withPillar.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("N_CELLS"),
        (sums.map(c => sum(col(c)).as(c)) ++ means.map(c => avg(col(c)).as(c))): _*)
    val stats =
      if (sums.contains("PORV") && sums.contains("VOLUME"))
        stats0.withColumn("PORO", col("PORV") / col("VOLUME"))
      else stats0

    if (!withPillar.columns.contains("SWAT")) stats // no saturations, no contacts
    else {
      val epsSoil = 0.01
      val keys = keyCols.map(col)
      val waterKeys = withPillar.filter(col("SWAT") > swatCutoff)
        .select(keys: _*).distinct()
      val hasSoil = withPillar.columns.contains("SOIL")
      val owcOpt =
        if (!hasSoil) None
        else Some(withPillar.filter(col("SOIL") > soilCutoff)
          .groupBy(keys: _*).agg(max(col("Z")).as("OWC"))
          .join(waterKeys, keyCols, "left_semi"))
      val gocOpt =
        if (!withPillar.columns.contains("SGAS")) None
        else if (hasSoil) {
          val oilKeys = withPillar.filter(col("SOIL") > epsSoil)
            .select(keys: _*).distinct()
          Some(withPillar.filter(col("SGAS") > sgasCutoff && col("SOIL") > epsSoil)
            .groupBy(keys: _*).agg(max(col("Z")).as("GOC"))
            .join(oilKeys, keyCols, "left_semi"))
        } else Some(withPillar.filter(col("SGAS") > sgasCutoff)
          .groupBy(keys: _*).agg(max(col("Z")).as("GWC"))
          .join(waterKeys, keyCols, "left_semi"))
      // Combine exactly like compute_pillar_contacts (pillars.py:310-318):
      // when BOTH contact frames are NON-EMPTY the contacts table is their
      // INNER join — a pillar with only one of OWC/GOC reports neither —
      // while an empty frame yields the other alone. Emptiness is a
      // runtime property, so probe it; the frames are materialized first
      // (per-pillar aggregates, dimension-sized) so the probe and the
      // later join replay local blocks instead of re-running the
      // aggregation pipeline twice.
      val owcM = owcOpt.map(_.localCheckpoint(true))
      val gocM = gocOpt.map(_.localCheckpoint(true))
      val contacts = (owcM.filterNot(_.isEmpty), gocM.filterNot(_.isEmpty)) match {
        case (Some(o), Some(g)) => Some(o.join(g, keyCols, "inner"))
        case (o, g) => o.orElse(g)
      }
      contacts.fold(stats)(c => stats.join(c, keyCols, "left"))
    }
  }

  /** `--group` aggregation over the per-pillar stats (reference
    * AGGREGATORS, pillars.py:18-35): sum for volumes and cell counts,
    * mean for coordinates / permeabilities / porosity / contact depths;
    * grouped over the region column (when present) and DATE (when
    * present), else one global row.
    */
  def grouped(stats: DataFrame, region: Option[String] = None): DataFrame = {
    val keys = region.filter(stats.columns.contains).toSeq ++
      (if (stats.columns.contains("DATE")) Seq("DATE") else Nil)
    val meanNames = Set("X", "Y", "Z", "PERMX", "PERMY", "PERMZ", "PORO",
      "OWC", "GOC", "GWC")
    val sumCols = stats.columns.filter(c => c == "N_CELLS" || c == "VOLUME" ||
      c == "PORV" || c.endsWith("VOL") || c.endsWith("VOLSURF"))
    val meanCols = stats.columns.filter(meanNames.contains)
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      meanCols.map(c => avg(col(c)).as(c))
    require(aggs.nonEmpty, "no aggregatable pillar columns")
    if (keys.isEmpty) stats.agg(aggs.head, aggs.tail: _*)
    else stats.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .orderBy(keys.map(col): _*)
  }

  /** Per-cell phase pore-volumes (reference compute_volumes,
    * pillars.py:144-200): SOIL = 1 − SWAT [− SGAS], phase volumes =
    * saturation × PORV, surface-condition variants when the inverse
    * formation-volume-factor columns (1OVERBO/1OVERBG) are present.
    * Column presence drives the output like the reference (two-phase
    * frames get no GASVOL).
    */
  def computeVolumes(grid: DataFrame): DataFrame = {
    val has = grid.columns.toSet
    require(has("PORV") && has("SWAT"), "computeVolumes needs PORV and SWAT")
    val soil =
      if (has("SGAS")) lit(1.0) - col("SWAT") - col("SGAS")
      else lit(1.0) - col("SWAT")
    val base = grid
      .withColumn("SOIL", soil)
      .withColumn("WATVOL", col("SWAT") * col("PORV"))
      .withColumn("OILVOL", col("SOIL") * col("PORV"))
    val withGas =
      if (has("SGAS")) base.withColumn("GASVOL", col("SGAS") * col("PORV")) else base
    val withOilSurf =
      if (has("1OVERBO")) withGas.withColumn("OILVOLSURF", col("OILVOL") * col("1OVERBO"))
      else withGas
    if (has("SGAS") && has("1OVERBG"))
      withOilSurf.withColumn("GASVOLSURF", col("GASVOL") * col("1OVERBG"))
    else withOilSurf
  }
}

/** Zone-level well completion data: the reference's wellcompletiondata.df()
  * (wellcompletiondata.py:35-215) composed from WellOps — zone merge, the
  * optional connection-status override, then the per-zone rollup.
  */
object WellCompletionData {

  /** @param compdat unrolled compdat frame (WELL,I,J,K1,K2,OP/SH,KH,DATE)
    * @param zonemap K-layer → zone name
    * @param connstatus optional change-log (DATE,WELL,I,J,K,OP/SH)
    * @param excludeWellPrefix drop wells with this name prefix (P10)
    */
  def df(compdat: DataFrame, zonemap: Map[Int, String],
      connstatus: Option[DataFrame] = None,
      excludeWellPrefix: Option[String] = None): DataFrame = {
    val filtered = excludeWellPrefix.fold(compdat)(p =>
      compdat.filter(!col("WELL").startsWith(p)))
    val merged = connstatus.fold(filtered)(cs =>
      WellOps.mergeCompdatAndConnstatus(filtered, cs))
    // layers the zonemap doesn't cover are dropped — an empty or
    // nothing-matching zonemap yields an EMPTY frame, like the reference
    // (test_wellcompletiondata.py::test_empty_zonemap)
    val zoned = GridOps.mergeZones(merged, zonemap, kCol = "K1")
      .filter(col("ZONE").isNotNull)
    WellOps.aggregateLayerToZone(zoned)
      .orderBy(col("WELL"), col("ZONE"), col("DATE"))
  }
}
