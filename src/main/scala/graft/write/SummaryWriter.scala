package graft.write

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Binary UNSMRY/SMSPEC writer (SURVEY.md §2.1 S16, the reverse-summary
  * sink; reference summary.py:602-689 delegates to the resdata library).
  *
  * The on-disk layout is the publicly documented Eclipse "ecl_kw" format:
  * Fortran unformatted sequential records (4-byte big-endian length framing
  * around each payload), where every keyword is a 16-byte header record
  * (8-char name, 4-byte element count, 4-char type mnemonic INTE/REAL/
  * DOUB/CHAR/LOGI) followed by data records chunked at 1000 numeric /
  * 105 CHAR elements. SMSPEC carries the vector catalog (KEYWORDS/
  * WGNAMES/NUMS/UNITS + DIMENS + STARTDAT); UNSMRY carries per-report-step
  * SEQHDR/MINISTEP/PARAMS records.
  *
  * Output files are inherently small (one float per vector per step), so
  * like every other include/text sink this formats on the driver from a
  * collected long-format frame — the 100 TB path never routes THROUGH this
  * sink; it's the boundary artifact handed back to simulator tooling.
  * `read` is the inverse (used by the round-trip spec).
  */
object SummaryWriter {

  private val NumChunk = 1000
  private val CharChunk = 105

  // ---- fortran unformatted framing ----------------------------------------

  private def record(out: DataOutputStream)(body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    body(new DataOutputStream(buf))
    val bytes = buf.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
    out.writeInt(bytes.length)
  }

  private def pad8(s: String): String = s.take(8).padTo(8, ' ')

  private def header(out: DataOutputStream, name: String, n: Int, typ: String): Unit =
    record(out) { o => o.writeBytes(pad8(name)); o.writeInt(n); o.writeBytes(typ.take(4).padTo(4, ' ')) }

  private def writeInte(out: DataOutputStream, name: String, data: Seq[Int]): Unit = {
    header(out, name, data.length, "INTE")
    data.grouped(NumChunk).foreach(chunk => record(out)(o => chunk.foreach(o.writeInt)))
  }

  private def writeReal(out: DataOutputStream, name: String, data: Seq[Float]): Unit = {
    header(out, name, data.length, "REAL")
    data.grouped(NumChunk).foreach(chunk => record(out)(o => chunk.foreach(o.writeFloat)))
  }

  private def writeChar(out: DataOutputStream, name: String, data: Seq[String]): Unit = {
    header(out, name, data.length, "CHAR")
    data.grouped(CharChunk).foreach(chunk =>
      record(out)(o => chunk.foreach(s => o.writeBytes(pad8(s)))))
  }

  // ---- writer --------------------------------------------------------------

  /** Split a summary mnemonic like `WOPR:OP_1` into (keyword, wgname). */
  private def splitVector(v: String): (String, String) = v.split(":", 2) match {
    case Array(k, w) => (k, w)
    case Array(k) => (k, ":+:+:+:+") // resdata's "no well/group" sentinel
  }

  /** Write a long-format summary frame `(DATE date/timestamp, VECTOR
    * string, VALUE double)` as SMSPEC + UNSMRY at `basePath.{SMSPEC,
    * UNSMRY}`. Returns the vector order used for PARAMS.
    */
  def write(df: DataFrame, basePath: String): Seq[String] = {
    val rows = df.select(col("DATE").cast("date"), col("VECTOR"), col("VALUE").cast("double"))
      .collect()
    val dates = rows.map(_.getDate(0).toLocalDate).distinct.sorted(Ordering.by[LocalDate, Long](_.toEpochDay))
    val vectors = rows.map(_.getString(1)).distinct.sorted.toIndexedSeq
    val byKey = rows.map(r => (r.getDate(0).toLocalDate, r.getString(1)) -> r.getDouble(2)).toMap
    val start = dates.headOption.getOrElse(LocalDate.of(2000, 1, 1))

    // TIME (days since start) is param 0, matching the convention that the
    // params vector always carries the clock.
    val allVectors = "TIME" +: vectors
    val smspec = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(s"$basePath.SMSPEC")))
    try {
      writeInte(smspec, "DIMENS", Seq(allVectors.length, 0, 0, 0, 0, -1))
      writeChar(smspec, "KEYWORDS", allVectors.map(v => splitVector(v)._1))
      writeChar(smspec, "WGNAMES", allVectors.map(v => splitVector(v)._2))
      writeInte(smspec, "NUMS", allVectors.map(_ => 0))
      writeChar(smspec, "UNITS", allVectors.map(_ => ""))
      writeInte(smspec, "STARTDAT",
        Seq(start.getDayOfMonth, start.getMonthValue, start.getYear, 0, 0, 0))
    } finally smspec.close()

    val unsmry = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(s"$basePath.UNSMRY")))
    try {
      dates.zipWithIndex.foreach { case (d, i) =>
        writeInte(unsmry, "SEQHDR", Seq(i))
        writeInte(unsmry, "MINISTEP", Seq(i))
        val params = (d.toEpochDay - start.toEpochDay).toFloat +:
          vectors.map(v => byKey.getOrElse((d, v), 0.0).toFloat)
        writeReal(unsmry, "PARAMS", params)
      }
    } finally unsmry.close()
    allVectors
  }

  // ---- reader (round-trip inverse) ----------------------------------------

  private case class Kw(name: String, typ: String, data: Seq[Any])

  private def readKw(in: DataInputStream): Option[Kw] = {
    val len0 = try in.readInt() catch { case _: EOFException => return None }
    require(len0 == 16, s"expected 16-byte header record, got $len0")
    val nameB = new Array[Byte](8); in.readFully(nameB)
    val n = in.readInt()
    val typB = new Array[Byte](4); in.readFully(typB)
    in.readInt() // trailing length
    val typ = new String(typB, "ASCII")
    val chunk = if (typ == "CHAR") CharChunk else NumChunk
    val data = Seq.newBuilder[Any]
    var remaining = n
    while (remaining > 0) {
      val take = math.min(chunk, remaining)
      val len = in.readInt()
      typ match {
        case "INTE" => (0 until take).foreach(_ => data += in.readInt())
        case "REAL" => (0 until take).foreach(_ => data += in.readFloat())
        case "DOUB" => (0 until take).foreach(_ => data += in.readDouble())
        case "CHAR" =>
          (0 until take).foreach { _ =>
            val b = new Array[Byte](8); in.readFully(b)
            data += new String(b, "ASCII").trim
          }
        case other => throw new IllegalArgumentException(s"unsupported kw type '$other'")
      }
      val _ = len
      in.readInt()
      remaining -= take
    }
    Some(Kw(new String(nameB, "ASCII").trim, typ, data.result()))
  }

  private def readAll(path: String): Seq[Kw] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    try Iterator.continually(readKw(in)).takeWhile(_.isDefined).flatten.toSeq
    finally in.close()
  }

  /** Read SMSPEC+UNSMRY back into the long `(DATE, VECTOR, VALUE)` form. */
  def read(spark: SparkSession, basePath: String): DataFrame = {
    val spec = readAll(s"$basePath.SMSPEC").map(k => k.name -> k).toMap
    val kws = spec("KEYWORDS").data.map(_.toString)
    val wgs = spec("WGNAMES").data.map(_.toString)
    val sd = spec("STARTDAT").data.map(_.asInstanceOf[Int])
    val start = LocalDate.of(sd(2), sd(1), sd(0))
    val vectors = kws.zip(wgs).map {
      case (k, w) if w.isEmpty || w == ":+:+:+:+" => k
      case (k, w) => s"$k:$w"
    }
    val out = Seq.newBuilder[(java.sql.Date, String, Double)]
    readAll(s"$basePath.UNSMRY").filter(_.name == "PARAMS").foreach { kw =>
      val vals = kw.data.map(_.asInstanceOf[Float])
      val date = java.sql.Date.valueOf(start.plusDays(vals.head.toLong))
      vectors.zip(vals).drop(1).foreach { case (v, x) =>
        out += ((date, v, x.toDouble))
      }
    }
    import spark.implicits._
    out.result().toDF("DATE", "VECTOR", "VALUE")
  }
}
