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

  /** Table-family keyword writer (reference satfunc/pvt df2res_*,
    * satfunc.py / pvt.py): rows grouped by a region column (SATNUM /
    * PVTNUM), each group emitted as one table of data lines closed by a
    * `/`, groups in ascending region order. Round-trips through the
    * corresponding module reader (record index == region number).
    */
  def tableKeyword(df: DataFrame, keyword: String, regionCol: String,
      valueCols: Seq[String]): String = {
    import org.apache.spark.sql.functions.col
    val sb = new StringBuilder
    sb.append(keyword).append('\n')
    sb.append("-- ").append(valueCols.mkString(" ")).append('\n')
    val rows = df.select((regionCol +: valueCols).map(col): _*).collect()
    rows.groupBy(_.get(0).toString.toDouble.toInt).toSeq.sortBy(_._1)
      .foreach { case (_, rs) =>
        rs.foreach(r => sb.append("  ").append(r.toSeq.tail.map(fmt).mkString(" ")).append('\n'))
        sb.append("/\n")
      }
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

  /** VFPPROD include text from the long-form table (S17,
    * vfp/_vfpprod.py:803-986): basic record, axis records, then one table
    * record per (THP,WFR,GFR,ALQ) point with the BHP row over the flow
    * axis. Inverse of modules/Vfp.vfpprod — round-trippable.
    */
  def vfpprod(long: DataFrame): String = {
    val rows = long.collect()
    val sb = new StringBuilder
    rows.groupBy(_.getAs[Int]("TABLE_NUMBER")).toSeq.sortBy(_._1).foreach { case (tno, rs) =>
      val h = rs.head
      def axis(c: String): Seq[Double] =
        rs.map(_.getAs[Double](c)).distinct.sorted.toSeq
      val (flow, thp, wfr, gfr, alq) =
        (axis("RATE"), axis("THP"), axis("WFR"), axis("GFR"), axis("ALQ"))
      sb.append("VFPPROD\n")
      sb.append(s"  $tno ${fmt(h.getAs[Double]("DATUM"))} '${h.getAs[String]("RATE_TYPE")}' " +
        s"'${h.getAs[String]("WFR_TYPE")}' '${h.getAs[String]("GFR_TYPE")}' " +
        s"'${h.getAs[String]("THP_TYPE")}' '${h.getAs[String]("ALQ_TYPE")}' " +
        s"'${h.getAs[String]("UNIT_TYPE")}' '${h.getAs[String]("TAB_TYPE")}' /\n")
      Seq(flow, thp, wfr, gfr, alq).foreach(a =>
        sb.append("  ").append(a.map(fmt).mkString(" ")).append(" /\n"))
      for (ti <- thp.indices; wi <- wfr.indices; gi <- gfr.indices; ai <- alq.indices) {
        val pts = rs.filter(r => r.getAs[Double]("THP") == thp(ti) &&
          r.getAs[Double]("WFR") == wfr(wi) && r.getAs[Double]("GFR") == gfr(gi) &&
          r.getAs[Double]("ALQ") == alq(ai))
        if (pts.nonEmpty) {
          val tab = pts.sortBy(_.getAs[Double]("RATE")).map(r => fmt(r.getAs[Double]("TAB")))
          sb.append(s"  ${ti + 1} ${wi + 1} ${gi + 1} ${ai + 1} ")
            .append(tab.mkString(" ")).append(" /\n")
        }
      }
      sb.append("/\n")
    }
    sb.toString
  }

  /** The reference's `common.df2res` dispatcher (common.py:508-625): route
    * a KEYWORD-columned tidy frame to the right writer per keyword, in
    * the order keywords appear. Table-family keywords (satfunc/PVT
    * simple tables) go through [[tableKeyword]] grouped on their region
    * column; everything else through [[genericDeckTable]] with the
    * bookkeeping columns dropped.
    */
  def df2res(df: DataFrame): String = {
    import org.apache.spark.sql.functions.col
    val tableFamilies: Map[String, (String, Seq[String])] = Map(
      "SWOF" -> ("SATNUM", Seq("SW", "KRW", "KROW", "PCOW")),
      "SGOF" -> ("SATNUM", Seq("SG", "KRG", "KROG", "PCOG")),
      "SWFN" -> ("SATNUM", Seq("SW", "KRW", "PCOW")),
      "SGFN" -> ("SATNUM", Seq("SG", "KRG", "PCOG")),
      "SLGOF" -> ("SATNUM", Seq("SL", "KRG", "KROG", "PCOG")),
      "SOF2" -> ("SATNUM", Seq("SO", "KRO")),
      "SOF3" -> ("SATNUM", Seq("SO", "KROW", "KROG")),
      "PVDO" -> ("PVTNUM", Seq("PRESSURE", "VOLUMEFACTOR", "VISCOSITY")),
      "PVDG" -> ("PVTNUM", Seq("PRESSURE", "VOLUMEFACTOR", "VISCOSITY")),
      "RSVD" -> ("EQLNUM", Seq("Z", "RS")),
      "RVVD" -> ("EQLNUM", Seq("Z", "RV")),
      "PBVD" -> ("EQLNUM", Seq("Z", "PB")),
      "PDVD" -> ("EQLNUM", Seq("Z", "PD")))
    require(df.columns.contains("KEYWORD"), "df2res needs a KEYWORD column")
    val keywords = df.select("KEYWORD").distinct().collect().map(_.getString(0)).sorted
    keywords.map { kw =>
      val part = df.filter(col("KEYWORD") === kw)
      tableFamilies.get(kw) match {
        case Some((region, cols)) if part.columns.contains(region) =>
          tableKeyword(part, kw, region, cols.filter(part.columns.contains))
        case _ =>
          val drop = Seq("KEYWORD", "DATE").filter(part.columns.contains)
          genericDeckTable(part.drop(drop: _*), kw)
      }
    }.mkString("\n")
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
