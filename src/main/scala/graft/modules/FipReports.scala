package graft.modules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIP region-report scraping from textual PRT files (S8,
  * fipreports.py:34-191).
  *
  * The reference walks the file with a stateful line parser carrying the
  * current date and region. Here the file is a line DataFrame with a
  * stable ordinal; the carried state is two forward-fill windows over that
  * ordinal (W1), and the colon-sectioned report rows parse with split/
  * regexp Column expressions — fully distributed, one pass.
  */
object FipReports {

  private val DateRe = """^\s{1,3}REPORT\s+\d+\s+(\d+)\s+([A-Z]{3})\s+(\d+)"""
  // any FIP-family region header; a different family's header closes the
  // current block (reference fipreports.py keeps an in_block flag)
  private val AnyRegionRe = """:\s*(FIP[A-Z0-9_]*)\s+REPORT\s+REGION\s+(\d+)"""

  private val MonthMap: Column = {
    val pairs = Seq("JAN" -> 1, "FEB" -> 2, "MAR" -> 3, "APR" -> 4, "MAY" -> 5,
      "JUN" -> 6, "JUL" -> 7, "JLY" -> 7, "AUG" -> 8, "SEP" -> 9, "OCT" -> 10,
      "NOV" -> 11, "DEC" -> 12)
    map(pairs.flatMap { case (m, n) => Seq(lit(m), lit(n)) }: _*)
  }

  /** Lift a text file into (line, idx, src) with a stable per-file
    * ordinal; `src` keys every downstream scan window so a corpus of PRT
    * files partitions per file instead of one global window.
    */
  def lines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // ONE file per call: a glob would zip a single global ordinal across
    // files and stamp them all with the same src, silently leaking scan
    // state (DATE/REGION forward-fill) across file boundaries. A corpus
    // maps this per file and unions the frames.
    require(!path.contains("*") && !path.contains(",") && !path.contains("{"),
      s"lines() reads one PRT file; got a multi-file pattern: $path")
    // a directory would be the same leak: textFile(dir) reads every file
    // inside under one global ordinal and one src value. Only checkable
    // for local paths — hdfs://-style URIs pass through (the wildcard
    // guard above still applies to them)
    val local = path.stripPrefix("file:")
    require(path.contains("://") ||
        java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(local)),
      s"lines() reads one PRT file; not a regular file: $path")
    // src rides IN the rows (a foldable lit() would be optimized out of
    // the window partition spec, reverting to the global-window shape)
    spark.read.textFile(path).rdd.zipWithIndex
      .map { case (l, i) => (l, i, path) }.toDF("line", "idx", "src")
  }

  def df(spark: SparkSession, path: String, fipname: String = "FIPNUM"): DataFrame =
    fromLines(lines(spark, path), fipname)

  /** Corpus scan: every PRT file under `path` (a directory, glob, or
    * comma-free multi-segment path) in ONE distributed plan. Each file
    * arrives whole in its task (`wholetext` — PRT files are human-scale
    * by nature, the same bound the reference's per-file line parser
    * assumes), so the per-file line ordinal is a narrow posexplode and
    * the scan-state windows partition on the file column — no
    * driver-side per-file loop, no RDD zipWithIndex job per file, and
    * adding files adds tasks, not jobs.
    */
  def corpusFromPath(spark: SparkSession, path: String,
      fipname: String = "FIPNUM"): DataFrame = {
    val whole = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("src"), col("value"))
    val linesDf = whole
      .select(col("src"), posexplode(split(col("value"), "\r?\n")).as(Seq("idx", "line")))
      .select(col("line"), col("idx").cast("long").as("idx"), col("src"))
    fromLines(linesDf, fipname, keepSrc = true)
  }

  def fromLines(linesDf: DataFrame, fipname: String = "FIPNUM",
      keepSrc: Boolean = false): DataFrame = {
    // per-file scan state: partition on src when the frame carries it
    // (lines() always does) — the corpus-scale shape by default
    val srcKeys = if (linesDf.columns.contains("src")) Seq(col("src")) else Nil
    val w = Window.partitionBy(srcKeys: _*).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dated = linesDf
      .withColumn("dd", regexp_extract(col("line"), DateRe, 1))
      .withColumn("mon", regexp_extract(col("line"), DateRe, 2))
      .withColumn("yy", regexp_extract(col("line"), DateRe, 3))
      .withColumn("dateHere",
        when(col("dd") =!= "", make_date(col("yy").cast("int"),
          element_at(MonthMap, col("mon")), col("dd").cast("int"))))
      .withColumn("family", regexp_extract(col("line"), AnyRegionRe, 1))
      .withColumn("regionHere",
        when(col("family") === fipname,
          regexp_extract(col("line"), AnyRegionRe, 2).cast("int"))
          .when(col("family") =!= "", lit(-1)) // other family → block closes
          // the table footer closes the block too (fipreports.py:162-164)
          .when(col("line").startsWith(" ============================"), lit(-1)))
      // the carried scan state: current date + current region block
      .withColumn("DATE", last(col("dateHere"), ignoreNulls = true).over(w))
      .withColumn("REGION", last(col("regionHere"), ignoreNulls = true).over(w))
      .filter(col("REGION").isNotNull && col("REGION") =!= -1)

    val sect = split(col("line"), ":")
    val rowName = upper(trim(regexp_replace(element_at(sect, 2), "\\s+", " ")))
    val oil = split(trim(element_at(sect, 3)), "\\s+")
    val water = trim(element_at(sect, 4))
    val gas = split(trim(element_at(sect, 5)), "\\s+")
    // two-phase runs leave whole sections blank (gas-water: no oil
    // columns) — an empty string must parse as null, and ANSI mode makes
    // a bare cast('') throw, so guard first
    def num(c: Column): Column = when(trim(c) =!= "", trim(c).cast("double"))

    dated
      // exactly the reference's allowed report-row starts
      // (fipreports.py:47) — a ":WELLS"/":FIELD" stat row inside a block
      // is NOT a region report row
      .filter(trim(col("line")).rlike("^:(CURRENTLY|OUTFLOW|MATERIAL|ORIGINALLY)"))
      .filter(col("REGION").isNotNull)
      .withColumn("DATATYPE",
        when(col("line").contains("OUTFLOW TO REGION"), "OUTFLOW TO REGION").otherwise(rowName))
      .withColumn("TO_REGION",
        when(col("line").contains("OUTFLOW TO REGION"),
          regexp_extract(element_at(sect, 2), """REGION\s+(\d+)""", 1).cast("int")))
      .withColumn("STOIIP_OIL", when(size(oil) === 3, num(oil(0))).when(size(oil) === 2, num(oil(0))))
      .withColumn("ASSOCIATEDOIL_GAS", when(size(oil) === 3, num(oil(1))))
      .withColumn("STOIIP_TOTAL",
        when(size(oil) === 3, num(oil(2))).when(size(oil) === 2, num(oil(1)))
          .otherwise(num(oil(0))))
      .withColumn("WIIP_TOTAL", num(water))
      .withColumn("GIIP_GAS", when(size(gas) >= 2, num(gas(0))))
      .withColumn("ASSOCIATEDGAS_OIL", when(size(gas) === 3, num(gas(1))))
      .withColumn("GIIP_TOTAL",
        when(size(gas) === 3, num(gas(2))).when(size(gas) === 2, num(gas(1)))
          .otherwise(num(gas(0))))
      .withColumn("FIPNAME", lit(fipname))
      // corpus callers get the file identity (basename) as SRC; the
      // single-file df() keeps the reference's exact column set
      .withColumn("SRC",
        if (keepSrc) regexp_extract(col("src"), "([^/]+)$", 1) else lit(null))
      .select(Seq("DATE", "FIPNAME", "REGION", "DATATYPE", "TO_REGION",
        "STOIIP_OIL", "ASSOCIATEDOIL_GAS", "STOIIP_TOTAL", "WIIP_TOTAL",
        "GIIP_GAS", "ASSOCIATEDGAS_OIL", "GIIP_TOTAL") ++
        (if (keepSrc) Seq("SRC") else Nil) map col: _*)
  }
}
