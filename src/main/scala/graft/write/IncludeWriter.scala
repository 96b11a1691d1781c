package graft.write

import org.apache.spark.sql.{DataFrame, Row}

/** Include-file text sinks — the reverse path (df2res): DataFrame →
  * Eclipse keyword text.
  *
  * Reference: generic fixed-width table writer common.py:508-750 (S13)
  * with quoting and `1*` defaults and trailing-default elision, and the
  * run-length-encoded grid vector export grid.py:623-756 +
  * runlength_compress common.py:753-784 (S14, the `5*2` syntax).
  *
  * Include files are human-readable driver-sized text, so formatting runs
  * on collected rows (the reference does the same); the RLE itself is a
  * linear fold. For cluster-sized exports, write per-partition fragments
  * with the same fold and concatenate.
  */
object IncludeWriter {

  private def fmt(v: Any): String = v match {
    case null => "1*"
    case s: String if s.isEmpty || s.exists(_.isWhitespace) => s"'$s'"
    case s: String => s
    case d: Double => if (d == d.floor && d.abs < 1e15) d.toLong.toString else d.toString
    case f: Float => fmt(f.toDouble)
    case t: java.sql.Timestamp => s"'${t.toLocalDateTime.toLocalDate}'"
    case x => x.toString
  }

  /** Generic keyword table: one record line per row, `1*` for nulls,
    * trailing defaults elided, terminating slash per record and a lone
    * slash closing the keyword.
    */
  def genericDeckTable(df: DataFrame, keyword: String, comment: Option[String] = None): String = {
    val sb = new StringBuilder
    comment.foreach(c => sb.append(c.linesIterator.map("-- " + _).mkString("", "\n", "\n")))
    sb.append(keyword).append('\n')
    sb.append("-- ").append(df.columns.mkString(" ")).append('\n')
    df.collect().foreach { row =>
      val cells = row.toSeq.map(fmt)
      // elide the trailing run of defaulted values (reference common.py:694-696)
      val trimmed = cells.reverse.dropWhile(_ == "1*").reverse
      sb.append("  ").append(trimmed.mkString(" ")).append(" /\n")
    }
    sb.append("/\n")
    sb.toString
  }

  /** Run-length compression of an ordered value sequence into Eclipse
    * `N*value` tokens (only runs >= `threshold` are compressed).
    */
  def runlengthCompress(values: Seq[Any], threshold: Int = 2): String = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < values.length) {
      var j = i
      while (j < values.length && values(j) == values(i)) j += 1
      val run = j - i
      val v = fmt(values(i))
      if (run >= threshold) out += s"$run*$v" else (1 to run).foreach(_ => out += v)
      i = j
    }
    out.result().grouped(10).map(_.mkString(" ")).mkString("\n")
  }

  /** Per-cell grid keyword export: values ordered by a global index column,
    * RLE-compressed (reference grid.df2res, grid.py:623-756).
    */
  def gridVector(df: DataFrame, valueCol: String, orderCol: String, keyword: String): String = {
    val values = df.select(orderCol, valueCol).collect()
      .sortBy(_.get(0).toString.toLong).map(_.get(1)).toSeq
    s"$keyword\n${runlengthCompress(values)}\n/\n"
  }

  /** EDITNNC keyword text from an NNC multiplier frame (S15,
    * nnc.py:206-276): `I1 J1 K1 I2 J2 K2 TRANM` records.
    */
  def editnnc(nnc: DataFrame, multColumn: String = "TRANM"): String = {
    val cols = Seq("I1", "J1", "K1", "I2", "J2", "K2", multColumn)
    genericDeckTable(nnc.select(cols.map(org.apache.spark.sql.functions.col): _*),
      "EDITNNC", Some(s"${nnc.count()} NNC connections to edit"))
  }
}
