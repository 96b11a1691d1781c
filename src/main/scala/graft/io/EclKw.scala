package graft.io

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.nio.ByteBuffer

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
  * (see [[EclBinary]], which ships per-task slices of the decoded arrays
  * and fans the per-cell work out over executors). Two properties keep
  * that driver step scale-safe on 10⁸-cell grids:
  *
  *   - payloads decode into TYPE-SPECIALIZED PRIMITIVE ARRAYS
  *     (`Array[Int]` / `Array[Float]` / `Array[Double]`), never boxed
  *     collections — ZCORN on a 10⁸-cell grid is 800M floats = 3.2 GB
  *     flat, vs ~20 GB+ boxed;
  *   - [[stream]] decodes ONE keyword at a time and SKIPS (seeks past)
  *     payloads the caller's header predicate rejects, so a selective
  *     read (e.g. two vectors out of a 50-vector INIT, or NNC keywords
  *     out of an EGRID) never materializes the rest of the file.
  */
object EclKw {

  /** One decoded keyword: `typ` is the 4-char mnemonic (INTE, REAL, DOUB,
    * CHAR, LOGI, MESS or C0NN for NN-wide strings); `data` is the
    * matching primitive array (`INTE`→`Array[Int]`, `REAL`→`Array[Float]`,
    * `DOUB`→`Array[Double]`, `LOGI`→`Array[Boolean]`, char types →
    * `Array[String]`).
    */
  final case class Kw(name: String, typ: String, data: Array[_]) {
    def length: Int = data.length
    def ints: Array[Int] = data.asInstanceOf[Array[Int]]
    def floats: Array[Float] = data.asInstanceOf[Array[Float]]
    /** Numeric payload widened to doubles. For REAL/INTE this ALLOCATES a
      * converted copy per call — hoist out of per-element loops.
      */
    def doubles: Array[Double] = typ match {
      case "DOUB" => data.asInstanceOf[Array[Double]]
      case "REAL" =>
        val f = floats; val out = new Array[Double](f.length)
        var i = 0; while (i < f.length) { out(i) = f(i); i += 1 }
        out
      case "INTE" =>
        val a = ints; val out = new Array[Double](a.length)
        var i = 0; while (i < a.length) { out(i) = a(i); i += 1 }
        out
      case other => throw new IllegalArgumentException(s"$name: $other is not numeric")
    }
    def strings: Array[String] = data.asInstanceOf[Array[String]]
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

  private final case class Head(name: String, n: Int, typ: String, w: Int)

  private def readHead(in: DataInputStream): Option[Head] = {
    val len0 = try in.readInt() catch { case _: EOFException => return None }
    require(len0 == 16, s"expected 16-byte keyword header record, got $len0")
    val nameB = new Array[Byte](8); in.readFully(nameB)
    val n = in.readInt()
    val typB = new Array[Byte](4); in.readFully(typB)
    in.readInt() // trailing length
    val typ = new String(typB, "ASCII").trim
    Some(Head(new String(nameB, "ASCII").trim, n, typ, elemWidth(typ)))
  }

  /** Decode the data records following `h`'s header into a primitive
    * array of exactly `h.n` elements. Each record must be a whole number
    * of elements (`len % width == 0` — a clear error AT the corrupt
    * record beats a desynced stream failing three keywords later);
    * zero-length data records (some writers emit them) are consumed and
    * skipped.
    */
  /** Read and validate one data record's leading length marker: the
    * ONE copy of the framing invariants (non-negative, whole elements,
    * within the remaining count) shared by the full decode, the skip
    * path, and the single-element peek — a framing fix lands in all
    * three walks at once.
    */
  private def recordLen(in: DataInputStream, h: Head, remaining: Int): Int = {
    val len = in.readInt()
    require(len >= 0 && len % h.w == 0,
      s"${h.name}: ${h.typ} record of $len bytes is not a whole number of ${h.w}-byte elements")
    require(len / h.w <= remaining,
      s"${h.name}: ${h.typ} record of $len bytes vs $remaining remaining elements")
    len
  }

  private def readData(in: DataInputStream, h: Head): Array[_] = {
    val out: Array[_] = h.typ match {
      case "INTE" => new Array[Int](h.n)
      case "REAL" => new Array[Float](h.n)
      case "DOUB" => new Array[Double](h.n)
      case "LOGI" => new Array[Boolean](h.n)
      case "MESS" => Array.empty[String]
      case _ => new Array[String](h.n) // CHAR / C0NN
    }
    val total = if (h.w == 0) 0 else h.n
    var filled = 0
    while (filled < total) {
      val len = recordLen(in, h, total - filled)
      val count = len / h.w
      if (count > 0) {
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val bb = ByteBuffer.wrap(bytes) // big-endian by default
        h.typ match {
          case "INTE" => bb.asIntBuffer().get(out.asInstanceOf[Array[Int]], filled, count)
          case "REAL" => bb.asFloatBuffer().get(out.asInstanceOf[Array[Float]], filled, count)
          case "DOUB" => bb.asDoubleBuffer().get(out.asInstanceOf[Array[Double]], filled, count)
          case "LOGI" =>
            val o = out.asInstanceOf[Array[Boolean]]
            var i = 0; while (i < count) { o(filled + i) = bb.getInt(i * 4) != 0; i += 1 }
          case _ =>
            val o = out.asInstanceOf[Array[String]]
            var i = 0
            while (i < count) { o(filled + i) = new String(bytes, i * h.w, h.w, "ASCII").trim; i += 1 }
        }
      }
      in.readInt() // trailing length
      filled += count
    }
    out
  }

  /** Seek past the data records following `h`'s header without decoding
    * (or allocating) anything.
    */
  private def skipData(in: DataInputStream, h: Head): Unit = {
    var remaining = if (h.w == 0) 0 else h.n
    while (remaining > 0) {
      val len = recordLen(in, h, remaining)
      skipFully(in, len)
      in.readInt() // trailing length
      remaining -= len / h.w
    }
  }

  /** Stream keywords one at a time: `select(name, typ, count)` decides
    * FROM THE HEADER whether a payload is decoded — rejected payloads are
    * seeked past, never read into memory — and the iterator handed to `f`
    * holds at most ONE decoded keyword. This is the scale path for
    * selective reads of multi-GB INIT/UNRST files; the iterator is only
    * valid inside `f` (the stream closes when `f` returns).
    */
  def stream[A](path: String, select: (String, String, Int) => Boolean = (_, _, _) => true)
      (f: Iterator[Kw] => A): A = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try {
      // advance LAZILY (in hasNext, not next()): stateful select
      // predicates — e.g. init's "n == nactive once INTEHEAD is seen" —
      // must observe the caller's processing of the PREVIOUS keyword
      // before the next header is judged; eager lookahead would decode
      // one payload with stale state
      val it = new Iterator[Kw] {
        private var nextKw: Kw = null
        private var eof = false
        private def advance(): Unit =
          while (nextKw == null && !eof) readHead(in) match {
            case None => eof = true
            case Some(h) =>
              if (select(h.name, h.typ, h.n)) nextKw = Kw(h.name, h.typ, readData(in, h))
              else skipData(in, h)
          }
        def hasNext: Boolean = { advance(); nextKw != null }
        def next(): Kw = {
          advance()
          if (nextKw == null) throw new NoSuchElementException("ecl kw stream exhausted")
          val k = nextKw; nextKw = null; k
        }
      }
      f(it)
    } finally in.close()
  }

  /** Decode every keyword in the file, in order (holds them all — use
    * [[stream]] with a `select` predicate for large files).
    */
  def read(path: String): Vector[Kw] = stream(path)(_.toVector)

  /** HEADER-ONLY walk: every keyword's (name, type, element count) with
    * every payload seeked past — a keyword's 24-byte header already
    * carries its element count, so per-file row-count prescans (the
    * `SupportsReportStatistics` estimates) cost one buffered pass of
    * headers + seeks and decode NOTHING.
    */
  def headers(path: String): Vector[(String, String, Int)] = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try {
      val b = Vector.newBuilder[(String, String, Int)]
      var h = readHead(in)
      while (h.isDefined) {
        b += ((h.get.name, h.get.typ, h.get.n))
        skipData(in, h.get)
        h = readHead(in)
      }
      b.result()
    } finally in.close()
  }

  private def skipFully(in: DataInputStream, n: Int): Unit = {
    var toSkip = n
    while (toSkip > 0) {
      val s = in.skipBytes(toSkip)
      if (s <= 0) throw new EOFException(s"EOF inside a data record ($toSkip bytes short)")
      toSkip -= s
    }
  }

  /** Decode ONLY element `elemIdx` of every REAL keyword named `kwName`,
    * in file order — 4 bytes read per occurrence, every other byte of
    * every payload seeked past. This is the UNSMRY date pre-scan: a
    * PARAMS record carries nvec floats per ministep (tens of KB on a
    * full-field SMSPEC), but a date-selective read only needs TIME
    * (element `timeIdx`) to decide whether the step is wanted at all —
    * the INTEHEAD-prescan discipline of the restart reader
    * (grid.py:54-123's dates2rstindices), applied inside the record.
    */
  def streamFloatElement(path: String, kwName: String, elemIdx: Int): Vector[Float] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try {
      val out = Vector.newBuilder[Float]
      var h = readHead(in)
      while (h.isDefined) {
        val hd = h.get
        if (hd.name == kwName) {
          require(hd.typ == "REAL",
            s"$kwName: element peek expects REAL, got ${hd.typ}")
          require(elemIdx >= 0 && elemIdx < hd.n,
            s"$kwName: element $elemIdx out of range (n=${hd.n})")
          var filled = 0
          while (filled < hd.n) {
            val len = recordLen(in, hd, hd.n - filled)
            val count = len / hd.w
            if (elemIdx >= filled && elemIdx < filled + count) {
              skipFully(in, (elemIdx - filled) * hd.w)
              out += in.readFloat()
              skipFully(in, (filled + count - elemIdx - 1) * hd.w)
            } else skipFully(in, len)
            in.readInt() // trailing length
            filled += count
          }
        } else skipData(in, hd)
        h = readHead(in)
      }
      out.result()
    } finally in.close()
  }

  /** Decode ONLY the elements at `elemIdxs` (ascending, distinct) of
    * each REAL keyword named `kwName` whose occurrence ordinal passes
    * `keepRecord`, in file order — `4·|elemIdxs|` bytes read per
    * selected occurrence, every other byte seeked past; rejected
    * occurrences skip whole. The generalization of
    * [[streamFloatElement]] from one peeked element to a selected slot
    * set: the `eclipse-unsmry` VECTOR pushdown reads (TIME + the
    * selected vectors') slots out of each PARAMS record, so a
    * one-vector fleet read of a 10⁴-vector SMSPEC touches ~0.01% of
    * the PARAMS payload bytes instead of decoding every record fully.
    * Returns `(occurrence ordinal, values aligned with elemIdxs)`.
    */
  def streamFloatSlots(path: String, kwName: String, elemIdxs: Array[Int],
      keepRecord: Int => Boolean): Vector[(Int, Array[Float])] = {
    require(elemIdxs.nonEmpty && elemIdxs(0) >= 0 &&
      elemIdxs.indices.tail.forall(j => elemIdxs(j) > elemIdxs(j - 1)),
      s"$kwName: slot indices must be non-negative, ascending and distinct " +
        "(a -1 from a failed indexOf would silently desync the stream)")
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try {
      val out = Vector.newBuilder[(Int, Array[Float])]
      var ord = -1
      var h = readHead(in)
      while (h.isDefined) {
        val hd = h.get
        if (hd.name == kwName) {
          ord += 1
          if (keepRecord(ord)) {
            require(hd.typ == "REAL",
              s"$kwName: slot decode expects REAL, got ${hd.typ}")
            require(elemIdxs.last < hd.n,
              s"$kwName: slot ${elemIdxs.last} out of range (n=${hd.n})")
            val vals = new Array[Float](elemIdxs.length)
            var p = 0 // next slot to read
            var filled = 0
            while (filled < hd.n) {
              val len = recordLen(in, hd, hd.n - filled)
              val count = len / hd.w
              var pos = filled // element cursor inside this data record
              while (p < elemIdxs.length && elemIdxs(p) < filled + count) {
                skipFully(in, (elemIdxs(p) - pos) * hd.w)
                vals(p) = in.readFloat()
                pos = elemIdxs(p) + 1
                p += 1
              }
              skipFully(in, (filled + count - pos) * hd.w)
              in.readInt() // trailing length
              filled += count
            }
            out += ((ord, vals))
          } else skipData(in, hd)
        } else skipData(in, hd)
        h = readHead(in)
      }
      out.result()
    } finally in.close()
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
  /** Resolve a case's sibling artifact path: prefer the canonical
    * uppercase extension, fall back to lowercase (mixed-case artifact
    * sets written by other tooling); returns the uppercase name when
    * neither exists, so the caller's open fails with the canonical
    * path in its message. Shared by every kernel that addresses a
    * sibling file (EGRID→INIT, UNSMRY→SMSPEC).
    */
  def sibling(base: String, ext: String): String =
    Seq(s"$base$ext", s"$base${ext.toLowerCase}")
      .find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .getOrElse(s"$base$ext")

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
  /** Stream marker-delimited keyword groups: at most ONE group's decoded
    * keywords live at a time — `f` maps each group to the values worth
    * retaining (not the Kws), so a many-group file (RFT with thousands of
    * TIME reports) never materializes whole. Groups `f` rejects cost one
    * group's transient decode.
    */
  def streamGroups[A](path: String, marker: String,
      select: (String, String, Int) => Boolean = (_, _, _) => true)
      (f: Seq[Kw] => Option[A]): Vector[A] =
    stream(path, select) { it =>
      val out = Vector.newBuilder[A]
      var cur: List[Kw] = Nil
      var started = false
      def flush(): Unit = if (started) f(cur.reverse).foreach(out += _)
      it.foreach { kw =>
        if (kw.name == marker) { flush(); cur = List(kw); started = true }
        else if (started) cur ::= kw
      }
      flush()
      out.result()
    }

}
