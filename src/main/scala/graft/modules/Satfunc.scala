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

  def keywordDf(events: DataFrame, keyword: String): DataFrame = {
    val names = Families(keyword)
    events.filter(col("keyword") === keyword && size(col("items")) > 0)
      .withColumn("SATNUM", col("recordIdx") + 1)
      .select(col("keywordIdx"), col("SATNUM"),
        explode(R.dataChunks(names)).as("row"))
      .select(Seq(lit(keyword).as("KEYWORD"), col("SATNUM")) ++
        names.map(n => col(s"row.$n").as(n)): _*)
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
    */
  def df(spark: SparkSession, deckText: String): DataFrame = {
    val events = DeckParser.toDS(spark, deckText).toDF()
    val present = Families.keys.toSeq.sorted
      .map(k => (k, keywordDf(events, k)))
      .filter { case (_, d) => !d.isEmpty }
      .map { case (k, d) => interpolateDefaults(d, k) }
    present.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse(spark.emptyDataFrame)
  }
}
