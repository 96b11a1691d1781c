package graft.cli

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.write.IncludeWriter

/** csv2res-style CLI: `runMain graft.cli.Csv2Res <KEYWORD> <in.csv> [out.inc]`
  * — the reverse path (reference csv2res.py): a tidy CSV becomes keyword
  * include text via the generic fixed-width writer. Round-trips with
  * Res2Csv through the deck parser.
  */
object Csv2Res {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: Csv2Res <KEYWORD> <in.csv> [out.inc]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("csv2res")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(args(1))
    // a CSV carrying its own KEYWORD column routes through the df2res
    // dispatcher (mixed keywords, table families); otherwise the named
    // keyword is written as one generic table
    val text =
      if (df.columns.contains("KEYWORD")) IncludeWriter.df2res(df)
      else IncludeWriter.genericDeckTable(df, args(0).toUpperCase)
    if (args.length >= 3) Files.writeString(Paths.get(args(2)), text)
    else print(text)
    spark.stop()
  }
}
