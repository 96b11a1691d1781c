package graft.io.datasource

import java.time.LocalDate
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DateType, DoubleType, StringType, StructType}

/** BATCH_WRITE for the `eclipse-unsmry` format — the S16 `df2ressum`
  * symmetry made SQL/DataFrame-reachable at FLEET scale:
  *
  *   df.write.format("eclipse-unsmry").mode("append").save(ensembleDir)
  *
  * Input is the long fleet form `(CASE, DATE, VECTOR, VALUE)`; each
  * distinct CASE lands as one `CASE.{SMSPEC, UNSMRY}` pair (CASE
  * resolves under the save path unless absolute). The write REQUIRES
  * clustering by CASE and ordering by (CASE, DATE, VECTOR) through
  * [[RequiresDistributionAndOrdering]] — Spark inserts the shuffle and
  * sort, so each task sees whole cases consecutively and the writer
  * streams one case's buffer at a time (a case is one float per vector
  * per step — always task-sized; this is the Spark-native shape of the
  * reference's per-case `df2ressum`, summary.py:602-689, run once per
  * realization by the engine instead of a driver loop). A
  * 1000-realization ensemble writes as ~1000 independent case files
  * across the cluster with exactly one exchange.
  *
  * Commit protocol (task-retry and speculative-attempt safe): every
  * attempt stages under a hidden per-attempt directory
  * (`.eclipse-unsmry-staging-<part>-<task>/` — invisible to the
  * `*.UNSMRY` readers), then promotes each file to an ATTEMPT-UNIQUE
  * temporary (`<base>.<ext>.inprogress-<task>`). Only the attempt whose
  * commit message the driver receives gets its temporaries renamed into
  * the canonical names (same-directory atomic rename per file); a
  * losing attempt's abort deletes only ITS OWN suffixed files, so
  * concurrent attempts can never clobber each other, and a crashed
  * attempt's debris never matches a reader's extension filter.
  */
class SummaryWriteBuilder(savePath: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  // per-case files are rewritten whole; "truncate" (SaveMode.Overwrite)
  // and append differ only for cases NOT in this write, which both
  // modes leave untouched — the ensemble dir is a keyed file store
  override def truncate(): WriteBuilder = this

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    private val schema = info.schema()
    // validate TYPES, not just names: supportsExternalMetadata hands the
    // DataFrame's own schema through analysis, so a TimestampType DATE
    // or IntegerType VALUE would otherwise reinterpret raw row slots
    private def need(name: String, t: org.apache.spark.sql.types.DataType): Unit = {
      val f = schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"eclipse-unsmry write needs column $name (schema: " +
            schema.fieldNames.mkString(", ") + ")"))
      require(f.dataType == t,
        s"eclipse-unsmry write column $name must be $t, got ${f.dataType} " +
          s"- cast it (e.g. CAST($name AS ${t.sql}))")
    }
    need("CASE", StringType); need("DATE", DateType)
    need("VECTOR", StringType); need("VALUE", DoubleType)

    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.identity("CASE")))
    override def requiredOrdering(): Array[SortOrder] = Array(
      Expressions.sort(Expressions.identity("CASE"), SortDirection.ASCENDING),
      Expressions.sort(Expressions.identity("DATE"), SortDirection.ASCENDING),
      Expressions.sort(Expressions.identity("VECTOR"), SortDirection.ASCENDING))

    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
        new SummaryWriterFactory(savePath, schema)
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        SummaryWriteSupport.finalizeFiles(messages)(
          (tmp, dst) => java.nio.file.Files.move(tmp, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE))
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        SummaryWriteSupport.finalizeFiles(messages)(
          (tmp, _) => java.nio.file.Files.deleteIfExists(tmp))
    }
  }
}

/** `files` are (attempt-unique temporary, canonical destination) pairs. */
private[datasource] case class SummaryCommit(files: Seq[(String, String)])
    extends WriterCommitMessage

private[datasource] object SummaryWriteSupport {
  def finalizeFiles(messages: Array[WriterCommitMessage])
      (op: (java.nio.file.Path, java.nio.file.Path) => Unit): Unit =
    messages.foreach {
      case SummaryCommit(files) => files.foreach { case (tmp, dst) =>
        op(java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(dst))
      }
      case other => throw new IllegalStateException(s"unexpected commit $other")
    }
}

private class SummaryWriterFactory(savePath: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SummaryCaseWriter(savePath, schema, partitionId, taskId)
}

/** Streams clustered+sorted rows, cutting a SMSPEC/UNSMRY pair at each
  * CASE boundary. Only ONE case's rows are buffered at a time. */
private class SummaryCaseWriter(savePath: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val iCase = schema.fieldIndex("CASE")
  private val iDate = schema.fieldIndex("DATE")
  private val iVec = schema.fieldIndex("VECTOR")
  private val iVal = schema.fieldIndex("VALUE")
  private var current: String = null
  private val buf = ArrayBuffer.empty[(LocalDate, String, Double)]
  private val files = ArrayBuffer.empty[(String, String)] // (tmp, dst)
  // hidden + attempt-unique: a crashed attempt's debris neither matches
  // a reader's *.UNSMRY filter nor collides with a retry's staging
  private val tag = s"$partitionId-$taskId"
  private var stageDir: java.nio.file.Path = null

  private def baseOf(c: String): String =
    if (c.startsWith("/")) c
    else java.nio.file.Paths.get(savePath, c).toString

  private def flush(): Unit = if (current != null && buf.nonEmpty) {
    val base = baseOf(current)
    val dir = Option(java.nio.file.Paths.get(base).getParent)
      .getOrElse(java.nio.file.Paths.get("."))
    java.nio.file.Files.createDirectories(dir)
    if (stageDir == null) {
      stageDir = dir.resolve(s".eclipse-unsmry-staging-$tag")
      java.nio.file.Files.createDirectories(stageDir)
    }
    val caseName = java.nio.file.Paths.get(base).getFileName.toString
    graft.write.SummaryWriter.writeCaseFiles(
      stageDir.resolve(caseName).toString, buf.toArray)
    Seq(".SMSPEC", ".UNSMRY").foreach { ext =>
      val tmp = java.nio.file.Paths.get(s"$base$ext.inprogress-$tag")
      java.nio.file.Files.move(stageDir.resolve(s"$caseName$ext"), tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      files += ((tmp.toString, s"$base$ext"))
    }
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(iCase) && !row.isNullAt(iDate) &&
      !row.isNullAt(iVec) && !row.isNullAt(iVal),
      "eclipse-unsmry write: CASE, DATE, VECTOR, VALUE must be non-null")
    val c = row.getUTF8String(iCase).toString
    if (c != current) { flush(); current = c }
    buf += ((LocalDate.ofEpochDay(row.getInt(iDate).toLong),
      row.getUTF8String(iVec).toString, row.getDouble(iVal)))
  }

  override def commit(): WriterCommitMessage = {
    flush()
    cleanupStage()
    SummaryCommit(files.toSeq)
  }
  override def abort(): Unit = {
    buf.clear()
    files.foreach { case (t, _) =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(t))
    }
    cleanupStage()
  }
  override def close(): Unit = cleanupStage()

  private def cleanupStage(): Unit = if (stageDir != null) {
    if (java.nio.file.Files.isDirectory(stageDir)) {
      val s = java.nio.file.Files.list(stageDir)
      try {
        val it = s.iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
      } finally s.close()
      java.nio.file.Files.deleteIfExists(stageDir)
    }
    stageDir = null
  }
}
