package graft.cli

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.modules._

/** res2csv-style CLI: `runMain graft.cli.Res2Csv <module> <deckfile> [out.csv]`.
  *
  * Mirrors the reference's CLI front (res2csv.py:266-272; S11 CSV sink,
  * common.py:116-152): extract one module's tidy frame from a deck and
  * write CSV to stdout or a file.
  */
object Res2Csv {

  val Modules: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compdat" -> ((s, t) => Compdat.df(s, t)),
    "gruptree" -> ((s, t) => Gruptree.df(s, t)),
    "satfunc" -> ((s, t) => Satfunc.df(s, t)),
    "faults" -> ((s, t) => Faults.df(s, t)),
    "equil" -> ((s, t) => Equil.df(s, t)),
    "pvt" -> ((s, t) => Pvt.df(s, t)),
    "wcon" -> ((s, t) => Wcon.df(s, t)),
    "vfp" -> ((s, t) => Vfp.df(s, t)),
    "welsegs" -> ((s, t) => Msw.welsegs(graft.io.DeckParser.toDS(s, t).toDF())),
    "compsegs" -> ((s, t) => Msw.compsegs(graft.io.DeckParser.toDS(s, t).toDF())),
    "wsegsicd" -> ((s, t) => Msw.wsegsicd(graft.io.DeckParser.toDS(s, t).toDF())),
    "wsegaicd" -> ((s, t) => Msw.wsegaicd(graft.io.DeckParser.toDS(s, t).toDF())),
    "wsegvalv" -> ((s, t) => Msw.wsegvalv(graft.io.DeckParser.toDS(s, t).toDF())),
  )

  /** Modules that take a file path (not deck text). */
  val PathModules: Set[String] = Set("fipreports")

  def main(args: Array[String]): Unit = {
    val known = Modules.keySet ++ PathModules
    if (args.length < 2 || !known.contains(args(0))) {
      System.err.println(s"usage: Res2Csv <${known.toSeq.sorted.mkString("|")}> <deckfile|prtfile> [out.csv]")
      sys.exit(2)
    }
    val deckText = if (PathModules.contains(args(0))) args(1)
      else Files.readString(Paths.get(args(1)))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("res2csv")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df =
      if (args(0) == "fipreports") FipReports.df(spark, deckText)
      else Modules(args(0))(spark, deckText)
    // deck-derived frames are driver-sized (decks are text written by
    // humans); stdout CSV matches the reference's write_dframe_stdout_file
    val rows = df.collect()
    val header = df.columns.mkString(",")
    val body = rows.map(_.toSeq.map {
      case null => ""
      case s: String if s.contains(",") => "\"" + s + "\""
      case v => v.toString
    }.mkString(",")).mkString("\n")
    val out = header + "\n" + body + "\n"
    if (args.length >= 3) Files.writeString(Paths.get(args(2)), out)
    else print(out)
    spark.stop()
  }
}
