package graft.modules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{DeckParser, Records => R}

/** Saturation-function tables (SWOF/SGOF/…) → tidy rows.
  *
  * Reference: satfunc.py:38-157. Each record is one SATNUM's full table as
  * a flat DATA list; SATNUM is the 1-based record counter (R7
  * recordcountername), and the list reshapes into fixed-width rows (R6).
  * Here: parse-side chunking via Records.dataChunks + one explode — no
  * iterrows, no shuffle until the union.
  */
object Satfunc {

  /** keyword → column block (reference satfunc column families). */
  val Families: Map[String, Seq[String]] = Map(
    "SWOF" -> Seq("SW", "KRW", "KROW", "PCOW"),
    "SGOF" -> Seq("SG", "KRG", "KROG", "PCOG"),
    "SLGOF" -> Seq("SL", "KRG", "KRO", "PCOG"), // KRO, not KROG (satfunc.py:56)
    "SWFN" -> Seq("SW", "KRW", "PCOW"),
    "SGFN" -> Seq("SG", "KRG", "PCOG"),
    "SGWFN" -> Seq("SG", "KRG", "KRW", "PCGW"),
    "SOF2" -> Seq("SO", "KRO"),
    "SOF3" -> Seq("SO", "KROW", "KROG"))

  def keywordDf(events: DataFrame, keyword: String): DataFrame =
    keywordDf(events, keyword, None)

  /** `ntsfun` is the explicit table-count override (inferdims.py:18-84
    * API parity — the reference's `satfunc.df(..., ntsfun=N)`): when the
    * deck's record structure under-counts (several tables concatenated in
    * one flat record — the shape opm needs TABDIMS for), records split
    * into tables wherever the saturation column DECREASES (Eclipse
    * requires strictly increasing saturation within a table — the same
    * monotonicity rule opm's strict reparse enforces), and the result
    * must come out to exactly `ntsfun` tables. Without the override the
    * record counter stands, as before.
    */
  def keywordDf(events: DataFrame, keyword: String, ntsfun: Option[Int]): DataFrame = {
    val names = Families(keyword)
    val base = events.filter(col("keyword") === keyword && size(col("items")) > 0)
      .select(col("keywordIdx"), col("recordIdx"),
        explode(R.dataChunks(names)).as("row"))
      .select(Seq(col("keywordIdx"), col("recordIdx"),
        col("row.row_idx").as("rowIdx")) ++
        names.map(n => col(s"row.$n").as(n)): _*)
    val numbered = ntsfun match {
      case None => base.withColumn("SATNUM", (col("recordIdx") + 1).cast("int"))
      case Some(n) =>
        graft.core.Ops.monotonicTableSplit(base, names.head, "SATNUM", n, keyword)
    }
    numbered.select(Seq(lit(keyword).as("KEYWORD"), col("SATNUM")) ++
      names.map(col): _*)
  }

  /** Defaulted (`1*`) table values fill by linear interpolation over the
    * saturation index, interior-only, per SATNUM — reference
    * satfunc.py:132-157 interpolate(method="index", limit_area="inside").
    */
  def interpolateDefaults(df: DataFrame, keyword: String): DataFrame = {
    val names = Families(keyword)
    names.tail.foldLeft(df)((d, c) =>
      graft.core.Ops.interpolateByIndex(d, c, names.head, Seq("SATNUM")))
  }

  /** All present families, unioned with per-family column sets
    * (unionByName allowMissingColumns — reference U1, satfunc.py:114-116).
    * `ntsfun` overrides the per-record table count for every family (the
    * reference's API takes one ntsfun for the whole call too).
    */
  def df(spark: SparkSession, deckText: String,
      ntsfun: Option[Int] = None): DataFrame = {
    val events = DeckParser.toDS(spark, deckText).toDF()
    val present = Families.keys.toSeq.sorted
      .map(k => (k, keywordDf(events, k, ntsfun)))
      .filter { case (_, d) => !d.isEmpty }
      .map { case (k, d) => interpolateDefaults(d, k) }
    present.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse(spark.emptyDataFrame)
  }
}
