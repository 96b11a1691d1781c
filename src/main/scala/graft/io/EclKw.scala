package graft.io

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}

/** Reader for the Eclipse "ecl_kw" binary keyword stream — the shared
  * on-disk framing of EGRID / INIT / UNRST / RFT / SMSPEC / UNSMRY files
  * (reference `resdatafiles.py:107-150` opens these via the resdata C
  * library; the format itself is public: Fortran unformatted sequential
  * records, 4-byte big-endian length framing, 16-byte keyword headers of
  * 8-char name + element count + 4-char type mnemonic, data chunked at
  * 1000 numeric / 105 character elements per record).
  *
  * The writer half lives in [[graft.write.SummaryWriter]] (S16); this
  * reader is deliberately LENGTH-DRIVEN — each data record's own framing
  * decides how many elements it carries — so files from any writer
  * (Eclipse, OPM flow, resdata) parse regardless of chunk conventions.
  *
  * Driver-side by design: a single binary artifact is one file on one
  * machine; the DISTRIBUTED work starts with the DataFrames built from it
  * (see [[EclBinary]], which broadcasts the decoded arrays and fans the
  * per-cell work out over executors).
  */
object EclKw {

  /** One decoded keyword: `typ` is the 4-char mnemonic (INTE, REAL, DOUB,
    * CHAR, LOGI, MESS or C0NN for NN-wide strings).
    */
  final case class Kw(name: String, typ: String, data: IndexedSeq[Any]) {
    def ints: IndexedSeq[Int] = data.asInstanceOf[IndexedSeq[Int]]
    def floats: IndexedSeq[Float] = data.asInstanceOf[IndexedSeq[Float]]
    def doubles: IndexedSeq[Double] = typ match {
      case "DOUB" => data.asInstanceOf[IndexedSeq[Double]]
      case "REAL" => floats.map(_.toDouble)
      case "INTE" => ints.map(_.toDouble)
      case other => throw new IllegalArgumentException(s"$name: $other is not numeric")
    }
    def strings: IndexedSeq[String] = data.asInstanceOf[IndexedSeq[String]]
    def isNumeric: Boolean = typ == "INTE" || typ == "REAL" || typ == "DOUB"
  }

  private def elemWidth(typ: String): Int = typ match {
    case "INTE" | "REAL" | "LOGI" => 4
    case "DOUB" => 8
    case "CHAR" => 8
    case "MESS" => 0
    case t if t.startsWith("C0") => t.drop(1).toInt
    case other => throw new IllegalArgumentException(s"unsupported ecl_kw type '$other'")
  }

  private def readKw(in: DataInputStream): Option[Kw] = {
    val len0 = try in.readInt() catch { case _: EOFException => return None }
    require(len0 == 16, s"expected 16-byte keyword header record, got $len0")
    val nameB = new Array[Byte](8); in.readFully(nameB)
    val n = in.readInt()
    val typB = new Array[Byte](4); in.readFully(typB)
    in.readInt() // trailing length
    val typ = new String(typB, "ASCII").trim
    val w = elemWidth(typ)
    val data = IndexedSeq.newBuilder[Any]
    var remaining = if (w == 0) 0 else n
    while (remaining > 0) {
      val len = in.readInt()
      val count = len / w
      require(count > 0 && count <= remaining,
        s"$typ record of $len bytes vs $remaining remaining elements")
      typ match {
        case "INTE" => (0 until count).foreach(_ => data += in.readInt())
        case "REAL" => (0 until count).foreach(_ => data += in.readFloat())
        case "DOUB" => (0 until count).foreach(_ => data += in.readDouble())
        case "LOGI" => (0 until count).foreach(_ => data += (in.readInt() != 0))
        case _ => // CHAR / C0NN
          (0 until count).foreach { _ =>
            val b = new Array[Byte](w); in.readFully(b)
            data += new String(b, "ASCII").trim
          }
      }
      in.readInt() // trailing length
      remaining -= count
    }
    Some(Kw(new String(nameB, "ASCII").trim, typ, data.result()))
  }

  /** Decode every keyword in the file, in order. */
  def read(path: String): Vector[Kw] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try Iterator.continually(readKw(in)).takeWhile(_.isDefined).flatten.toVector
    finally in.close()
  }

  // ---- writer (the inverse; Eclipse chunk conventions) ---------------------

  private val NumChunk = 1000
  private val CharChunk = 105

  private def record(out: java.io.DataOutputStream)(body: java.io.DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    body(new java.io.DataOutputStream(buf))
    val bytes = buf.toByteArray
    out.writeInt(bytes.length); out.write(bytes); out.writeInt(bytes.length)
  }

  /** Write keywords in the standard framing (1000 numeric / 105 char
    * elements per data record) — the inverse of [[read]]; SMSPEC/UNSMRY
    * writing in [[graft.write.SummaryWriter]] and synthetic test
    * artifacts both ride on it.
    */
  def write(path: String, kws: Seq[Kw]): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try kws.foreach { kw =>
      record(out) { o =>
        o.writeBytes(kw.name.take(8).padTo(8, ' '))
        o.writeInt(kw.data.length)
        o.writeBytes(kw.typ.take(4).padTo(4, ' '))
      }
      val chunk = if (kw.typ == "CHAR" || kw.typ.startsWith("C0")) CharChunk else NumChunk
      val w = elemWidth(kw.typ)
      kw.data.grouped(chunk).foreach { group =>
        record(out) { o =>
          group.foreach {
            case i: Int => o.writeInt(i)
            case f: Float => o.writeFloat(f)
            case d: Double => o.writeDouble(d)
            case b: Boolean => o.writeInt(if (b) -1 else 0)
            case s: String => o.writeBytes(s.take(w).padTo(w, ' '))
            case other => throw new IllegalArgumentException(s"${kw.name}: $other")
          }
        }
      }
    } finally out.close()
  }

  /** Split a keyword stream into groups, each STARTING at a keyword named
    * `marker` (content before the first marker is dropped) — the record
    * grouping of UNRST (SEQNUM) and RFT (TIME) files.
    */
  def groupsBy(kws: Seq[Kw], marker: String): Seq[Seq[Kw]] = {
    val out = Seq.newBuilder[Seq[Kw]]
    var cur: List[Kw] = Nil
    var started = false
    kws.foreach { kw =>
      if (kw.name == marker) {
        if (started) out += cur.reverse
        cur = List(kw); started = true
      } else if (started) cur ::= kw
    }
    if (started) out += cur.reverse
    out.result()
  }
}
