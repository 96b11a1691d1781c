package graft.io.datasource

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.io.DeckParser

/** DataSourceV2 `eclipse-deck` file format: `spark.read.format("eclipse-deck")
  * .load(path)` yields the DeckEvent stream (keywordIdx, keyword, recordIdx,
  * items) — the SURVEY §4.3 "later milestone" source, making decks
  * first-class scan inputs with column pruning
  * (SupportsPushDownRequiredColumns) instead of a driver-side parse. One
  * input partition per deck file: a deck is one sequential keyword stream
  * (the ordinal is the schedule spine), so the file is the natural
  * parallelism unit — a corpus of decks parallelizes across files.
  */
class DeckDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eclipse-deck"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeckDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DeckTable(properties.asScala.getOrElse("path",
      properties.asScala.getOrElse("paths", "")))
}

object DeckDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("keywordIdx", IntegerType, nullable = false),
    StructField("keyword", StringType, nullable = false),
    StructField("recordIdx", IntegerType, nullable = false),
    StructField("items", ArrayType(StringType), nullable = false),
    StructField("deckId", StringType, nullable = false)))
}

class DeckTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"eclipse-deck:$path"
  override def schema(): StructType = DeckDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("path")).filter(_.nonEmpty).getOrElse(path)
    new DeckScanBuilder(p)
  }
}

class DeckScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DeckDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new DeckScan(path, required)
}

class DeckScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val files = DeckScan.splitPaths(path).flatMap(p => DeckScan.expand(p))
    DeckScan.pack(files).map(DeckInputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DeckReaderFactory(required)
}

object DeckScan {
  /** Multi-path `load(a, b, …)` arrives as a JSON string array in the
    * `paths` option (Spark's DataFrameReader encoding); single-path load
    * and comma-joined strings arrive plain.
    */
  private[graft] def splitPaths(raw: String): Seq[String] = {
    val t = raw.trim
    // a JSON paths array is ["..."] — requiring the quote right after the
    // bracket keeps legal bracket GLOBS like [0-9]*/deck.DATA out of this
    // branch
    val split =
      if (t.startsWith("[\"") && t.endsWith("]"))
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(t)
          .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
          .toVector
      else t.split(",").map(_.trim).filter(_.nonEmpty).toVector
    split.map(stripFileScheme)
  }

  /** `CREATE TABLE … USING \`eclipse-…\` OPTIONS (path '…')` stores the
    * path as the table LOCATION, normalized to a `file:` URI — strip the
    * scheme back to a plain local path for java.io (globs make the
    * string an illegal URI, hence the prefix fallback). */
  private def stripFileScheme(p: String): String =
    if (!p.startsWith("file:")) p
    else try {
      val u = new java.net.URI(p)
      if (u.getPath != null && u.getPath.nonEmpty) u.getPath else p.stripPrefix("file:")
    } catch { case _: java.net.URISyntaxException => p.stripPrefix("file:") }

  /** Fleet-friendly path resolution: a directory yields its contained
    * `ext` files (case-insensitive; `.DATA` for decks, `.EGRID`/`.UNRST`
    * for the binary formats); globs (`*`/`?`/`[]`) may sit in ANY path
    * segment — realizations/&#42;/deck.DATA — and expand level by level;
    * a plain file passes through. Deterministic (sorted) so partition
    * numbering is stable across runs.
    */
  private[graft] def expand(p: String, lenient: Boolean = false,
      ext: String = ".DATA"): Seq[String] = {
    import java.nio.file.{Files, Path, Paths}
    def isGlob(s: String) = s.exists("*?[".contains(_))
    def listMatching(dir: Path, pattern: String): Vector[Path] = {
      if (!Files.isDirectory(dir)) return Vector.empty
      val matcher = java.nio.file.FileSystems.getDefault
        .getPathMatcher(s"glob:$pattern")
      val s = Files.list(dir)
      try s.iterator().asScala.filter(f => matcher.matches(f.getFileName))
        .toVector.sortBy(_.toString)
      finally s.close()
    }
    if (!isGlob(p)) {
      val path = Paths.get(p)
      if (Files.isDirectory(path)) {
        val s = Files.list(path)
        try s.iterator().asScala
          .filter(f => f.toString.toUpperCase.endsWith(ext) &&
            Files.isRegularFile(f))
          .map(_.toString).toVector.sorted
        finally s.close()
      } else if (Files.isRegularFile(path)) Seq(p)
      else if (lenient) Nil // a glob-matched dir missing the tail file
      else throw new IllegalArgumentException(s"eclipse source: no such file: $p")
    } else {
      // walk segment by segment: expand the FIRST glob segment against
      // its directory level, recurse into the remainder
      val abs = p.startsWith("/")
      val segs = p.split("/").filter(_.nonEmpty).toList
      val firstGlob = segs.indexWhere(isGlob)
      val prefix = (if (abs) "/" else "") + segs.take(firstGlob).mkString("/")
      val baseDir = Paths.get(if (prefix.isEmpty) "." else prefix)
      val rest = segs.drop(firstGlob + 1)
      listMatching(baseDir, segs(firstGlob)).flatMap { m =>
        if (rest.isEmpty) {
          if (Files.isRegularFile(m)) Seq(m.toString)
          else if (Files.isDirectory(m)) expand(m.toString, lenient = true, ext = ext)
          else Nil
        } else
          // a matched dir may legitimately lack the tail (a failed
          // realization) — skip it rather than shipping a nonexistent
          // path into a partition
          expand((m.toString +: rest).mkString("/"), lenient = true, ext = ext)
      }
    }
  }

  /** Size-aware bin packing, the FilePartition convention: a fleet of
    * tiny decks groups several files per task (one 10⁵-file corpus must
    * not pay 10⁵ task launches), while decks at or above the target size
    * keep a task to themselves. Greedy first-fit over the sorted list —
    * deterministic partition contents.
    */
  private[datasource] def pack(files: Seq[String]): Seq[Seq[String]] = {
    import java.nio.file.{Files, Paths}
    if (files.isEmpty) return Nil
    val sized = files.map(f =>
      f -> (try Files.size(Paths.get(f)) catch { case _: Exception => 1L }))
    val parallelism =
      try org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism
      catch { case _: Exception => 8 }
    val target = math.max(64L << 10,
      sized.map(_._2).sum / math.max(1, 4 * parallelism))
    val bins = Vector.newBuilder[Seq[String]]
    var cur = Vector.newBuilder[String]
    var curBytes = 0L
    var curN = 0
    sized.foreach { case (f, sz) =>
      if (curN > 0 && curBytes + sz > target) {
        bins += cur.result(); cur = Vector.newBuilder[String]
        curBytes = 0L; curN = 0
      }
      cur += f; curBytes += sz; curN += 1
    }
    if (curN > 0) bins += cur.result()
    bins.result()
  }
}

case class DeckInputPartition(files: Seq[String]) extends InputPartition

class DeckReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[DeckInputPartition].files
    new PartitionReader[InternalRow] {
      // INCLUDEs expand like every other entry point (a raw read would
      // silently drop included sections); deckId = the FULL path — a
      // basename would collide across realisation directories and merge
      // their window partitions. One deck parses at a time (lazy
      // flatMap), so a packed partition holds one deck's events, not
      // the bin's.
      private val events = files.iterator.flatMap { file =>
        val p = java.nio.file.Paths.get(file)
        DeckParser.parse(
          DeckParser.expandIncludes(
            new String(java.nio.file.Files.readAllBytes(p)), p.getParent),
          deckId = p.toString).iterator
      }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!events.hasNext) return false
        val e = events.next()
        val values = required.fieldNames.map {
          case "keywordIdx" => e.keywordIdx
          case "keyword" => UTF8String.fromString(e.keyword)
          case "recordIdx" => e.recordIdx
          case "items" => ArrayData.toArrayData(
            e.items.map(UTF8String.fromString).toArray)
          case "deckId" => UTF8String.fromString(e.deckId)
        }
        current = InternalRow.fromSeq(values.toIndexedSeq)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
