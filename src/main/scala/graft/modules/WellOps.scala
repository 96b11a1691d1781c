package graft.modules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Ops

/** Well connection status + zone-level completion rollups — the
  * reference's wellconnstatus.py and wellcompletiondata.py.
  */
object WellOps {

  /** CPI vector name pattern (P12, wellconnstatus.py:38-48):
    * `CPI:<WELL>:<I>,<J>,<K>`.
    */
  val CpiRe = "^CPI[:][A-Z0-9_-]{1,8}[:][0-9]+,[0-9]+,[0-9]+$"

  /** Connection status change-log from long-format summary CPI vectors
    * `(DATE, VECTOR, VALUE)` (W3, wellconnstatus.py:67-86): a connection
    * OPENs when CPI goes 0→positive (first positive sample included) and
    * SHUTs on positive→0. One lag window per connection — the canonical
    * change-detection idiom; shuffle key is the connection.
    */
  def wellConnStatus(cpiLong: DataFrame): DataFrame = {
    val parsed = cpiLong
      .filter(col("VECTOR").rlike(CpiRe))
      .withColumn("WELL", split(col("VECTOR"), ":")(1))
      .withColumn("ijk", split(split(col("VECTOR"), ":")(2), ","))
      .withColumn("I", col("ijk")(0).cast("int"))
      .withColumn("J", col("ijk")(1).cast("int"))
      .withColumn("K", col("ijk")(2).cast("int"))
      .drop("ijk")
    val w = Window.partitionBy(col("WELL"), col("I"), col("J"), col("K"))
      .orderBy(col("DATE"))
    parsed
      .withColumn("open", col("VALUE") > 0)
      .withColumn("prev_open", lag(col("open"), 1).over(w))
      .filter(
        (col("prev_open").isNull && col("open")) ||           // first positive → OPEN
          (col("prev_open").isNotNull && col("prev_open") =!= col("open")))
      .withColumn("OP/SH", when(col("open"), "OPEN").otherwise("SHUT"))
      .select(col("DATE"), col("WELL"), col("I"), col("J"), col("K"), col("OP/SH"))
  }

  /** Zone-level completion rollup (A4, wellcompletiondata
    * ._aggregate_layer_to_zone, wellcompletiondata.py:141-165):
    * KH sums over OPEN layers (0 when none), status is OPEN if any layer
    * is open else SHUT.
    */
  def aggregateLayerToZone(compdatZoned: DataFrame): DataFrame =
    compdatZoned.groupBy(col("WELL"), col("ZONE"), col("DATE"))
      .agg(
        coalesce(sum(when(col("OP/SH") === "OPEN", col("KH"))), lit(0.0)).as("KH"),
        when(max(when(col("OP/SH") === "OPEN", 1).otherwise(0)) === 1, "OPEN")
          .otherwise("SHUT").as("OP/SH"))

  /** Merge compdat with the connection-status change log (J8,
    * _merge_compdat_and_connstatus, wellcompletiondata.py:168-215):
    * status wins where a well has connstatus rows (left join + first-wins
    * dedup); wells absent from connstatus keep their compdat rows
    * (anti-join + union).
    */
  def mergeCompdatAndConnstatus(compdat: DataFrame, connstatus: DataFrame): DataFrame = {
    val cs = connstatus.select(col("WELL"), col("I"), col("J"),
      col("K").as("K1"), col("DATE"), col("OP/SH").as("CS_OPSH"))
    val csWells = cs.select(col("WELL")).distinct()
    val matched = compdat.drop("DATE", "OP/SH")
      .join(cs, Seq("WELL", "I", "J", "K1"), "inner")
      .withColumnRenamed("CS_OPSH", "OP/SH")
    val dedup = Ops.lastWinsDedup(matched,
      keys = Seq("WELL", "I", "J", "K1", "DATE"), ord = Seq(lit(1)))
    val unmatched = compdat.join(csWells, Seq("WELL"), "left_anti")
    dedup.unionByName(unmatched.select(dedup.columns.map(col): _*))
  }
}
