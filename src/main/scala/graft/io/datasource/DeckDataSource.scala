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
  override def planInputPartitions(): Array[InputPartition] =
    path.split(",").filter(_.nonEmpty).map(_.trim)
      .flatMap(DeckScan.expand)
      .map(DeckInputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new DeckReaderFactory(required)
}

object DeckScan {
  /** Fleet-friendly path resolution: a directory yields its *.DATA files,
    * a glob (`*`/`?`/`[]` in the LAST segment) expands against its parent
    * directory, a plain file passes through. Deterministic (sorted) so
    * partition numbering is stable across runs.
    */
  private[datasource] def expand(p: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val path = Paths.get(p)
    val name = Option(path.getFileName).map(_.toString).getOrElse("")
    if (name.exists("*?[".contains(_))) {
      val dir = Option(path.getParent).getOrElse(Paths.get("."))
      val matcher = java.nio.file.FileSystems.getDefault
        .getPathMatcher(s"glob:$name")
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(f => matcher.matches(f.getFileName) && Files.isRegularFile(f))
        .map(_.toString).toVector.sorted
      finally s.close()
    } else if (Files.isDirectory(path)) {
      val s = Files.list(path)
      try s.iterator().asScala
        .filter(f => f.toString.toUpperCase.endsWith(".DATA") &&
          Files.isRegularFile(f))
        .map(_.toString).toVector.sorted
      finally s.close()
    } else Seq(p)
  }
}

case class DeckInputPartition(file: String) extends InputPartition

class DeckReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DeckInputPartition].file
    new PartitionReader[InternalRow] {
      // INCLUDEs expand like every other entry point (a raw read would
      // silently drop included sections); deckId = the FULL path — a
      // basename would collide across realisation directories and merge
      // their window partitions
      private val events = {
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
