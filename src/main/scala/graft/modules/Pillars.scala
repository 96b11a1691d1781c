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

  /** @param grid cell frame with I, J, X, Y, Z, VOLUME [, PORV, PERM*,
    *             SWAT, SGAS, DATE]
    * @param region optional region column name (e.g. EQLNUM/FIPNUM) to
    *               include in the pillar key
    * @param swatCutoff OWC detection threshold; GOC uses sgasCutoff
    */
  def df(grid: DataFrame, region: Option[String] = None,
      swatCutoff: Double = 0.7, sgasCutoff: Double = 0.7): DataFrame = {
    val keyCols = Seq("PILLAR") ++ region ++
      (if (grid.columns.contains("DATE")) Seq("DATE") else Nil)
    val withPillar = grid.withColumn("PILLAR", concat_ws("-", col("I"), col("J")))

    val sums = Seq("VOLUME", "PORV").filter(grid.columns.contains)
    val means = Seq("X", "Y", "Z", "PERMX", "PERMY", "PERMZ", "PORO")
      .filter(grid.columns.contains)
    val stats = withPillar.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("N_CELLS"),
        (sums.map(c => sum(col(c)).as(c)) ++ means.map(c => avg(col(c)).as(c))): _*)

    val withOwc =
      if (grid.columns.contains("SWAT")) {
        val owc = withPillar.filter(col("SWAT") > swatCutoff)
          .groupBy(keyCols.map(col): _*).agg(max(col("Z")).as("OWC"))
        stats.join(owc, keyCols, "left")
      } else stats
    if (grid.columns.contains("SGAS")) {
      val goc = withPillar.filter(col("SGAS") > sgasCutoff)
        .groupBy(keyCols.map(col): _*).agg(min(col("Z")).as("GOC"))
      withOwc.join(goc, keyCols, "left")
    } else withOwc
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
