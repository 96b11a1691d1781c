package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ops
import graft.modules.GridOps
import graft.sources.Tables

/** Remaining projection/filter/lookup operator demos (SURVEY.md §2.2):
  * glob column selection, constant-column pruning, zone-map lookup joins,
  * boundary-preserving date crops.
  */
object Extras {

  // ---- P1/P2: fnmatch-glob column selection --------------------------------
  def q32Glob(s: SparkSession, dir: String): DataFrame =
    Ops.globSelect(Tables.lineitem(s, dir),
        keep = Seq("l_orderkey", "l_linenumber"), globs = Seq("l_q*", "l_ret*"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  // ---- P5: drop constant columns (keep-list honored) -----------------------
  // Under l_returnflag='R' only the flag itself is single-valued at this SF.
  def q33DropConst(s: SparkSession, dir: String): DataFrame =
    Ops.dropConstantColumns(
        Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  // ---- J4: broadcast zone-map lookup (element_at on a map literal) ---------
  def q34ZoneMap(s: SparkSession, dir: String): DataFrame = {
    val zonemap = (0 until 25).map(k => k -> s"G${k / 5}").toMap
    GridOps.mergeZones(Tables.supplier(s, dir), zonemap, kCol = "s_nationkey")
      .select(col("s_suppkey"), col("s_nationkey"), col("ZONE").as("zone"))
      .orderBy(col("s_suppkey"))
  }

  // ---- P6: date-range crop force-including the global boundary rows --------
  // Reference _crop_datelist (summary.py:88-127): explicit start/end rows
  // survive the crop even when outside the range.
  def q35Crop(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    val cropped = ev.filter(col("ts").between(
      lit("2024-01-10 00:00:00").cast("timestamp"),
      lit("2024-01-20 00:00:00").cast("timestamp")))
    val boundaries = ev.join(broadcast(bounds),
      col("ts") === col("mn") || col("ts") === col("mx")).drop("mn", "mx")
    cropped.unionByName(boundaries).distinct()
      .select(col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("event_id"))
  }

  private val ParamCases = 20

  /** S9/S10/J14 under the gate (q68): per case a generated lyr zonemap
    * text (quoted zone names, K ranges, an UNMAPPED tail at K=11..12)
    * and a parameters text rotating through the reference's THREE
    * formats — YAML (c%3=0), JSON (c%3=1), txt pairs (c%3=2) — parsed
    * by the real cascade (`parseParameters`: yaml → json → txt) and the
    * real lyr tokenizer, then applied to a per-case K frame via the
    * broadcast zone lookup (`mergeZones`) and the params fan-out
    * (`mergeParams`). The oracle replays the closed form, so a parse
    * divergence in ANY of the three formats (or the unmapped-layer null
    * path) breaks the hash.
    */
  def q68ParamZone(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = (0 until ParamCases).map { c =>
      val a = 3 + c % 3
      val lyr = s"'UPPER$c' 1-$a\n'MID$c' ${a + 1}-8\n'LOWER$c' 9-10"
      val ptext = (c % 3) match {
        case 0 => s"FWL: ${100 + c}\nRMS_SEED: ${7 * c}"
        // the hard tab makes YAML reject it (MarkedYAMLException, probed)
        // while JSON allows tab whitespace — so the cascade's JSON
        // FALLBACK branch genuinely runs; plain JSON is also valid YAML
        // and would be eaten by the yaml branch, leaving json dead
        case 1 => s"{\t\"FWL\": ${100 + c}, \"RMS_SEED\": ${7 * c}}"
        case _ => s"FWL ${100 + c}\nRMS_SEED ${7 * c}"
      }
      val base = (1 to 12).map(k => (c, k, (k * 10 + c).toLong))
        .toDF("case_id", "K", "value")
      val zoned = GridOps.mergeZones(base, GridOps.parseLyr(lyr), "K")
      GridOps.mergeParams(zoned, GridOps.parseParameters(ptext))
    }
    frames.reduce(_ unionByName _)
      .select(col("case_id"), col("K").as("k"), col("value"),
        col("ZONE").as("zone"), col("FWL").as("fwl"), col("RMS_SEED").as("rms_seed"))
      .orderBy(col("case_id"), col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_glob" -> (q32Glob _),
    "q33_dropconst" -> (q33DropConst _),
    "q34_zonemap" -> (q34ZoneMap _),
    "q35_crop" -> (q35Crop _),
    "q68_param_zone" -> (q68ParamZone _),
  )

  private val zoneList = (0 until 25).map(k => s"'G${k / 5}'").mkString("[", ",", "]")

  val oracleSql: Map[String, String] = Map(
    "q32_glob" ->
      """SELECT l_orderkey, l_quantity, l_returnflag, l_linenumber
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q33_dropconst" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                l_extendedprice, l_discount, l_tax, l_linestatus, l_shipdate
         FROM lineitem WHERE l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""",
    "q34_zonemap" ->
      s"""SELECT s_suppkey, s_nationkey, ($zoneList)[s_nationkey + 1] AS zone
          FROM supplier ORDER BY s_suppkey""",
    "q35_crop" ->
      """SELECT event_id, ts, event_type FROM events
         WHERE (ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00')
            OR ts = (SELECT min(ts) FROM events)
            OR ts = (SELECT max(ts) FROM events)
         ORDER BY event_id""",
    "q68_param_zone" ->
      s"""WITH cases AS (SELECT unnest(range($ParamCases)) AS c),
          ks AS (SELECT c, unnest(range(1, 13)) AS k FROM cases)
          SELECT CAST(c AS INT) AS case_id, CAST(k AS INT) AS k,
                 k * 10 + c AS value,
                 CASE WHEN k <= 3 + c % 3 THEN 'UPPER' || CAST(c AS VARCHAR)
                      WHEN k <= 8 THEN 'MID' || CAST(c AS VARCHAR)
                      WHEN k <= 10 THEN 'LOWER' || CAST(c AS VARCHAR)
                      ELSE NULL END AS zone,
                 CAST(100 + c AS VARCHAR) AS fwl,
                 CAST(7 * c AS VARCHAR) AS rms_seed
          FROM ks ORDER BY case_id, k""",
  )
}
