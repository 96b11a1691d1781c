package graft.modules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VFP unit system tables (reference vfp/_vfpdefs.py:103-318): for each
  * unit system (DEFAULT/METRIC/FIELD/LAB/PVT-M) the unit string of every
  * quantity axis, keyed by the axis' declared type (RATE_TYPE, WFR_TYPE,
  * …). DEFAULT (no UNITS entry in the keyword) carries empty units.
  */
object VfpDefs {

  private val FloProd = Map(
    "DEFAULT" -> Map("OIL" -> "", "LIQ" -> "", "GAS" -> "", "WG" -> "", "TM" -> ""),
    "METRIC" -> Map("OIL" -> "sm3/day", "LIQ" -> "sm3/day", "GAS" -> "sm3/day",
      "WG" -> "sm3/day", "TM" -> "kg-M/day"),
    "FIELD" -> Map("OIL" -> "stb/day", "LIQ" -> "stb/day", "GAS" -> "Mscf/day",
      "WG" -> "lb-M/day", "TM" -> "lb-M/day"),
    "LAB" -> Map("OIL" -> "scc/hr", "LIQ" -> "scc/hr", "GAS" -> "scc/hr",
      "WG" -> "scc/hr", "TM" -> "lb-M/day"),
    "PVT-M" -> Map("OIL" -> "sm3/day", "LIQ" -> "sm3/day", "GAS" -> "sm3/day",
      "WG" -> "sm3/day", "TM" -> "kg-M/day"))

  private val Thp = Map(
    "DEFAULT" -> Map("THP" -> "barsa"), "METRIC" -> Map("THP" -> "barsa"),
    "FIELD" -> Map("THP" -> "psia"), "LAB" -> Map("THP" -> "atma"),
    "PVT-M" -> Map("THP" -> "atma"))

  private val Wfr = Map(
    "DEFAULT" -> Map("WOR" -> "", "WCT" -> "", "WGR" -> "", "WWR" -> "", "WTF" -> ""),
    "METRIC" -> Map("WOR" -> "sm3/sm3", "WCT" -> "sm3/sm3", "WGR" -> "sm3/sm3",
      "WWR" -> "sm3/sm3", "WTF" -> ""),
    "FIELD" -> Map("WOR" -> "stb/stb", "WCT" -> "stb/stb", "WGR" -> "stb/Mscf",
      "WWR" -> "stb/Mscf", "WTF" -> ""),
    "LAB" -> Map("WOR" -> "scc/scc", "WCT" -> "scc/scc", "WGR" -> "scc/scc",
      "WWR" -> "scc/scc", "WTF" -> ""),
    "PVT-M" -> Map("WOR" -> "sm3/sm3", "WCT" -> "sm3/sm3", "WGR" -> "sm3/sm3",
      "WWR" -> "sm3/sm3", "WTF" -> ""))

  private val Gfr = Map(
    "DEFAULT" -> Map("GOR" -> "", "GLR" -> "", "OGR" -> "", "MMW" -> ""),
    "METRIC" -> Map("GOR" -> "sm3/sm3", "GLR" -> "sm3/sm3", "OGR" -> "sm3/sm3",
      "MMW" -> "kg/kg-M"),
    "FIELD" -> Map("GOR" -> "Mscf/stb", "GLR" -> "Mscf/stb", "OGR" -> "stb/Mscf",
      "MMW" -> "lb/lb-M"),
    "LAB" -> Map("GOR" -> "scc/scc", "GLR" -> "scc/scc", "OGR" -> "scc/scc",
      "MMW" -> "lb/lb-M"),
    "PVT-M" -> Map("GOR" -> "sm3/sm3", "GLR" -> "sm3/sm3", "OGR" -> "sm3/sm3",
      "MMW" -> "kg/kg-M"))

  private val Alq = Map(
    "DEFAULT" -> Map("GRAT" -> "", "IGLR" -> "", "TGLR" -> "", "DENO" -> "",
      "DENG" -> "", "BEAN" -> "", "''" -> ""),
    "METRIC" -> Map("GRAT" -> "sm3/day", "IGLR" -> "sm3/sm3", "TGLR" -> "sm3/sm3",
      "DENO" -> "kg/m3", "DENG" -> "kg/m3", "BEAN" -> "mm", "''" -> ""),
    "FIELD" -> Map("GRAT" -> "Mscf/day", "IGLR" -> "Mscf/stb", "TGLR" -> "Mscf/stb",
      "DENO" -> "lb/ft3", "DENG" -> "lb/ft3", "BEAN" -> "1/64", "''" -> ""),
    "LAB" -> Map("GRAT" -> "scc/hr", "IGLR" -> "scc/scc", "TGLR" -> "scc/scc",
      "DENO" -> "gm/cc", "DENG" -> "gm/cc", "BEAN" -> "mm", "''" -> ""),
    "PVT-M" -> Map("GRAT" -> "sm3/day", "IGLR" -> "sm3/sm3", "TGLR" -> "sm3/sm3",
      "DENO" -> "kg/m3", "DENG" -> "kg/m3", "BEAN" -> "mm", "''" -> ""))

  private val FloInj = Map(
    "DEFAULT" -> Map("OIL" -> "", "WAT" -> "", "GAS" -> "", "WG" -> "", "TM" -> ""),
    "METRIC" -> Map("OIL" -> "sm3/day", "WAT" -> "sm3/day", "GAS" -> "sm3/day",
      "WG" -> "sm3/day", "TM" -> "kg-M/day"),
    "FIELD" -> Map("OIL" -> "stb/day", "WAT" -> "stb/day", "GAS" -> "Mscf/day",
      "WG" -> "Mscf/day", "TM" -> "lb-M/day"),
    "LAB" -> Map("OIL" -> "scc/hr", "WAT" -> "scc/hr", "GAS" -> "scc/hr",
      "WG" -> "scc/hr", "TM" -> "gm-M/hr"),
    "PVT-M" -> Map("OIL" -> "sm3/day", "WAT" -> "sm3/day", "GAS" -> "sm3/day",
      "WG" -> "sm3/day", "TM" -> "kg-M/day"))

  private val ThpInj = Map(
    "DEFAULT" -> Map("THP" -> ""), "METRIC" -> Map("THP" -> "barsa"),
    "FIELD" -> Map("THP" -> "psia"), "LAB" -> Map("THP" -> "atma"),
    "PVT-M" -> Map("THP" -> "atma"))

  private def lookup(table: Map[String, Map[String, String]],
      unitType: Column, typeCol: Column): Column =
    element_at(element_at(typedlit(table), unitType), typeCol)

  /** Attach per-axis unit columns (RATE_UNIT, PRESSURE_UNIT and — for
    * VFPPROD rows — WFR_UNIT/GFR_UNIT/ALQ_UNIT) resolved from
    * (UNIT_TYPE, *_TYPE): two nested literal-map lookups per column, a
    * narrow codegen'd projection with no joins. Rows of the other VFP
    * type (a prod/inj union) resolve to null units for absent axes.
    */
  def withUnits(df: DataFrame): DataFrame = {
    val isProd = col("VFP_TYPE") === "VFPPROD"
    val base = df
      .withColumn("RATE_UNIT",
        when(isProd, lookup(FloProd, col("UNIT_TYPE"), col("RATE_TYPE")))
          .otherwise(lookup(FloInj, col("UNIT_TYPE"), col("RATE_TYPE"))))
      .withColumn("PRESSURE_UNIT",
        when(isProd, lookup(Thp, col("UNIT_TYPE"), col("PRESSURE_TYPE")))
          .otherwise(lookup(ThpInj, col("UNIT_TYPE"), col("PRESSURE_TYPE"))))
    if (!df.columns.contains("WFR_TYPE")) base
    else base
      .withColumn("WFR_UNIT", lookup(Wfr, col("UNIT_TYPE"), col("WFR_TYPE")))
      .withColumn("GFR_UNIT", lookup(Gfr, col("UNIT_TYPE"), col("GFR_TYPE")))
      .withColumn("ALQ_UNIT", lookup(Alq, col("UNIT_TYPE"), col("ALQ_TYPE")))
  }
}
