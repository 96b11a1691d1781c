package graft.io.datasource

import java.time.LocalDate
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

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
  * Commit protocol: tasks write `<base>.<ext>.inprogress` and the
  * driver COMMIT renames all pairs into place (same-directory atomic
  * rename per file); abort deletes the temporaries — a failed job
  * leaves no half-written case visible under the canonical names.
  */
class SummaryWriteBuilder(savePath: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  // per-case files are rewritten whole; "truncate" (SaveMode.Overwrite)
  // and append differ only for cases NOT in this write, which both
  // modes leave untouched — the ensemble dir is a keyed file store
  override def truncate(): WriteBuilder = this

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    private val schema = info.schema()
    require(Seq("CASE", "DATE", "VECTOR", "VALUE")
      .forall(schema.fieldNames.contains),
      s"eclipse-unsmry write needs CASE, DATE, VECTOR, VALUE columns; got " +
        schema.fieldNames.mkString(", "))

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

private[datasource] case class SummaryCommit(tmpFiles: Seq[String])
    extends WriterCommitMessage

private[datasource] object SummaryWriteSupport {
  val InProgress = ".inprogress"

  def finalizeFiles(messages: Array[WriterCommitMessage])
      (op: (java.nio.file.Path, java.nio.file.Path) => Unit): Unit =
    messages.foreach {
      case SummaryCommit(tmps) => tmps.foreach { t =>
        op(java.nio.file.Paths.get(t),
          java.nio.file.Paths.get(t.stripSuffix(InProgress)))
      }
      case other => throw new IllegalStateException(s"unexpected commit $other")
    }
}

private class SummaryWriterFactory(savePath: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SummaryCaseWriter(savePath, schema)
}

/** Streams clustered+sorted rows, cutting a SMSPEC/UNSMRY pair at each
  * CASE boundary. Only ONE case's rows are buffered at a time. */
private class SummaryCaseWriter(savePath: String, schema: StructType)
    extends DataWriter[InternalRow] {
  private val iCase = schema.fieldIndex("CASE")
  private val iDate = schema.fieldIndex("DATE")
  private val iVec = schema.fieldIndex("VECTOR")
  private val iVal = schema.fieldIndex("VALUE")
  private var current: String = null
  private val buf = ArrayBuffer.empty[(LocalDate, String, Double)]
  private val written = ArrayBuffer.empty[String]

  private def baseOf(c: String): String =
    if (c.startsWith("/")) c
    else java.nio.file.Paths.get(savePath, c).toString

  private def flush(): Unit = if (current != null && buf.nonEmpty) {
    val base = baseOf(current)
    Option(java.nio.file.Paths.get(base).getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    // write to .inprogress names; the driver commit renames into place
    graft.write.SummaryWriter.writeCaseFiles(
      s"$base${SummaryWriteSupport.InProgress}-stage", buf.toArray)
    Seq(".SMSPEC", ".UNSMRY").foreach { ext =>
      val staged = java.nio.file.Paths.get(
        s"$base${SummaryWriteSupport.InProgress}-stage$ext")
      val tmp = java.nio.file.Paths.get(
        s"$base$ext${SummaryWriteSupport.InProgress}")
      java.nio.file.Files.move(staged, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      written += tmp.toString
    }
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    val c = row.getUTF8String(iCase).toString
    if (c != current) { flush(); current = c }
    buf += ((LocalDate.ofEpochDay(row.getInt(iDate).toLong),
      row.getUTF8String(iVec).toString, row.getDouble(iVal)))
  }

  override def commit(): WriterCommitMessage = {
    flush()
    SummaryCommit(written.toSeq)
  }
  override def abort(): Unit = {
    buf.clear()
    written.foreach(t =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(t)))
  }
  override def close(): Unit = ()
}
