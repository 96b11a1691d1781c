package graft.io.datasource

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.io.EclBinary

/** DataSourceV2 formats over the Eclipse BINARY artifact kernels — the
  * full fleet surface made SQL-reachable (SURVEY §4.3's "later
  * milestone", closing the loop the `eclipse-deck` source opened for
  * text decks):
  *
  *   spark.read.format("eclipse-egrid").option("vectors", "PORO,PERMX")
  *     .load("realizations/&#42;/CASE.EGRID")
  *   spark.read.format("eclipse-unrst").option("vectors", "PRESSURE")
  *     .load("realizations/&#42;/CASE.UNRST")
  *   spark.read.format("eclipse-unsmry").load("realizations/&#42;/CASE.UNSMRY")
  *   spark.read.format("eclipse-rft").option("vectors", "DEPTH,PRESSURE")
  *     .load("realizations/&#42;/CASE.RFT")
  *
  * All four formats decode through the SAME per-case kernels as the
  * library fleet readers ([[EclBinary.gridCaseRows]] /
  * [[EclBinary.restartCaseRows]] / [[EclBinary.rftCaseRows]] /
  * [[graft.write.SummaryWriter.summaryCaseTuples]] — one decode path,
  * so the SQL-reachable form can never diverge from the gates over the
  * library fleet reads). Partitioning is ONE INPUT PARTITION PER CASE:
  * a realization is the natural parallel unit of an ensemble (the
  * 100–1000-realization history-match layout), and each task's state is
  * one case's selected arrays.
  *
  * Column pruning (SupportsPushDownRequiredColumns) reaches the BYTE
  * level where the file layout allows it: a pruned INIT/UNRST/RFT
  * vector is seeked past by the [[graft.io.EclKw.stream]] predicate,
  * never decoded — and if no INIT vector column survives pruning, the
  * egrid scan never opens the INIT file at all. (UNSMRY PARAMS records
  * interleave all vectors per step, so its long form prunes columns
  * after decode — the record is the decode unit there.) `vectors` is a
  * comma list of EXACT uppercase vector names (the unioned fleet schema
  * must be fixed before any file opens, the same contract as the
  * library fleet readers); vectors missing in a case surface as nulls.
  */
class EclGridDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eclipse-egrid"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EclBinaryDataSource.schemaFor("egrid", EclBinaryDataSource.vectorsOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    EclBinaryDataSource.table("egrid", properties)
}

class EclRestartDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eclipse-unrst"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EclBinaryDataSource.schemaFor("unrst", EclBinaryDataSource.vectorsOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    EclBinaryDataSource.table("unrst", properties)
}

class EclSummaryDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eclipse-unsmry"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EclBinaryDataSource.schemaFor("unsmry", Nil)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    EclBinaryDataSource.table("unsmry", properties)
}

class EclRftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eclipse-rft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EclBinaryDataSource.schemaFor("rft", EclBinaryDataSource.vectorsOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    EclBinaryDataSource.table("rft", properties)
}

object EclBinaryDataSource {
  private[datasource] def vectorsOf(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("vectors")).toSeq
      .flatMap(_.split(",")).map(_.trim.toUpperCase).filter(_.nonEmpty)

  private[datasource] def table(kind: String,
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = properties.asScala.getOrElse("path",
      properties.asScala.getOrElse("paths", ""))
    // unsmry's five-column long schema has no vector columns: a stray
    // vectors option must not leak into the reader's index math
    val vectors = if (kind == "unsmry") Nil else vectorsOf(opts)
    new EclBinaryTable(kind, path, vectors,
      opts.getBoolean("mapaxes", false))
  }

  private[datasource] def extOf(kind: String): String = kind match {
    case "egrid" => ".EGRID"
    case "unrst" => ".UNRST"
    case "unsmry" => ".UNSMRY"
    case "rft" => ".RFT"
  }

  def schemaFor(kind: String, vectors: Seq[String]): StructType = kind match {
    case "egrid" => StructType(
      StructField("CASE", StringType, nullable = false) +:
        (EclBinary.GeomSchema.fields.toSeq ++
          vectors.map(v => StructField(v, DoubleType, nullable = true))))
    case "unrst" => StructType(
      StructField("CASE", StringType, nullable = false) ::
        StructField("DATE", DateType, nullable = false) ::
        StructField("ACTIVE_IDX", LongType, nullable = false) ::
        vectors.map(v => StructField(v, DoubleType, nullable = true)).toList)
    case "unsmry" => StructType(Seq(
      StructField("CASE", StringType, nullable = false),
      StructField("DATE", DateType, nullable = false),
      StructField("VECTOR", StringType, nullable = false),
      StructField("VALUE", DoubleType, nullable = false),
      StructField("STEP", IntegerType, nullable = false)))
    case "rft" => StructType(
      StructField("CASE", StringType, nullable = false) ::
        StructField("DATE", DateType, nullable = true) ::
        StructField("WELL", StringType, nullable = false) ::
        StructField("CONIDX", IntegerType, nullable = false) ::
        vectors.map(v => StructField(v, DoubleType, nullable = true)).toList)
  }

  /** Fixed (non-vector) leading columns of each kind's kernel row —
    * derived from the declared schema so the reader's index math can
    * never drift from what the scan advertises. */
  private[datasource] def fixedFields(kind: String): Seq[String] =
    schemaFor(kind, Nil).fieldNames.toSeq

  /** Expand the load path(s) to sorted case files of the given extension
    * (same multi-path / glob / directory rules as the deck source; the
    * extension threads into directory listings so a bare ensemble
    * directory load finds its members). */
  private[datasource] def cases(path: String, ext: String): Seq[String] = {
    val files = DeckScan.splitPaths(path)
      .flatMap(p => DeckScan.expand(p, ext = ext))
      .filter(_.toUpperCase.endsWith(ext))
      .distinct.sorted
    require(files.nonEmpty, s"no $ext files match $path")
    files
  }
}

class EclBinaryTable(kind: String, path: String, vectors: Seq[String],
    mapaxes: Boolean) extends Table with SupportsRead {
  override def name(): String = s"eclipse-$kind:$path"
  override def schema(): StructType =
    EclBinaryDataSource.schemaFor(kind, vectors)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("path")).filter(_.nonEmpty).getOrElse(path)
    new EclBinaryScanBuilder(kind, p, vectors, mapaxes, schema())
  }
}

class EclBinaryScanBuilder(kind: String, path: String, vectors: Seq[String],
    mapaxes: Boolean, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new EclBinaryScan(kind, path, vectors, mapaxes, required)
}

class EclBinaryScan(kind: String, path: String, vectors: Seq[String],
    mapaxes: Boolean, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // the partition carries the file path AS LISTED — the kernels never
    // re-append an extension, so lowercase artifact sets stay readable
    EclBinaryDataSource.cases(path, EclBinaryDataSource.extOf(kind))
      .map(f => EclCaseInputPartition(f): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EclBinaryReaderFactory(kind, vectors, mapaxes, required)
}

case class EclCaseInputPartition(caseFile: String) extends InputPartition

class EclBinaryReaderFactory(kind: String, vectors: Seq[String],
    mapaxes: Boolean, required: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val caseFile = partition.asInstanceOf[EclCaseInputPartition].caseFile
    // only the REQUIRED vector columns are decoded: the pruned ones are
    // seeked past at the byte level by the kernels' keyword predicate
    val requiredVecs = vectors.filter(required.fieldNames.contains)
    val fixed = EclBinaryDataSource.fixedFields(kind)
    val srcIdx: Map[String, Int] = fixed.zipWithIndex.toMap ++
      requiredVecs.zipWithIndex.map { case (v, i) => v -> (fixed.length + i) }
    val extractors: Array[Row => Any] = required.fields.map { f =>
      val i = srcIdx(f.name)
      f.dataType match {
        case StringType => (r: Row) => UTF8String.fromString(r.getString(i))
        case IntegerType => (r: Row) => r.getInt(i)
        case LongType => (r: Row) => r.getLong(i)
        case DateType => (r: Row) =>
          if (r.isNullAt(i)) null else DateTimeUtils.fromJavaDate(r.getDate(i))
        case DoubleType => (r: Row) =>
          if (r.isNullAt(i)) null else r.getDouble(i)
        case other => throw new IllegalArgumentException(s"unexpected type $other")
      }
    }
    // hoisted: per-row conversion must not re-copy the extractor array
    val exs = scala.collection.immutable.ArraySeq.unsafeWrapArray(extractors)
    new PartitionReader[InternalRow] {
      private val rows: Iterator[Row] = kind match {
        case "egrid" => EclBinary.gridCaseRows(caseFile, requiredVecs, mapaxes)
        case "unrst" => EclBinary.restartCaseRows(caseFile, requiredVecs)
        case "rft" => EclBinary.rftCaseRows(caseFile, requiredVecs)
        case "unsmry" => graft.write.SummaryWriter.summaryCaseTuples(caseFile)
          .map(t => Row(t._1, t._2, t._3, t._4, t._5))
      }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val r = rows.next()
        current = InternalRow.fromSeq(exs.map(_(r)))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
