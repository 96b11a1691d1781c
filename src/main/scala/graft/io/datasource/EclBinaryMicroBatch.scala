package graft.io.datasource

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset,
  ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** MICRO_BATCH_READ for the binary ensemble formats — arriving
  * realizations become a STREAM:
  *
  *   spark.readStream.format("eclipse-unsmry").load("ensemble/&#42;.UNSMRY")
  *
  * An ensemble run lands case files over hours as realizations finish;
  * this source turns each newly arrived case into exactly one input
  * partition of the next micro-batch, decoded by the SAME per-case
  * kernels (and honoring the same pushed-down DATE/WELL/CASE filters)
  * as the batch scan — so a live misfit scoreboard (q143's shape) can
  * watch UNSMRY files directly instead of a converted event table.
  *
  * Offsets are the SORTED LIST of case files already surfaced,
  * serialized as a JSON array into the checkpoint's offset log — the
  * same recovery contract as Spark's own file source: a restart reads
  * the last committed offset and processes only files not in it.
  * Ensembles are 10²–10³ cases, so the offset is a few hundred paths —
  * well inside offset-log scale (the built-in file source logs the
  * same information per batch). A file, once listed, is assumed
  * immutable and never re-read (the simulator writes a case once and
  * moves on; in-progress cases should be written under a different
  * extension or directory and renamed into place, the standard
  * atomic-publish idiom).
  */
class EclBinaryMicroBatchStream(kind: String, path: String,
    vectors: Seq[String], mapaxes: Boolean, required: StructType,
    datePred: graft.io.DatePred, wells: Option[Set[String]],
    caseSet: Option[Set[String]], maxCasesPerTrigger: Option[Int],
    vectorSel: Option[Set[String]] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def listNow(): Seq[String] =
    EclBinaryDataSource.casesLenient(path, EclBinaryDataSource.extOf(kind))
      .filter(f => caseSet.forall(_.contains(EclBinaryDataSource.caseIdOf(kind, f))))

  // AvailableNow contract: snapshot the listing once, then drain ONLY
  // that snapshot (files landing mid-drain wait for the next run) — so
  // the trigger terminates even on a live directory
  private var availableNowSnapshot: Option[Seq[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(listNow())

  override def getDefaultReadLimit: ReadLimit =
    maxCasesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control: `maxCasesPerTrigger` cases per micro-batch (a
    * case = a file = one input partition), the file source's
    * maxFilesPerTrigger for the ensemble layout — bounds a batch's
    * decode work when a backlog of finished realizations lands at once.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[EclFilesOffset].files.toSet
    val unseen = availableNowSnapshot.getOrElse(listNow()).filterNot(seen).sorted
    val admitted = limit match {
      case mf: ReadMaxFiles => unseen.take(mf.maxFiles())
      case _ => unseen
    }
    EclFilesOffset((seen ++ admitted).toSeq)
  }

  override def initialOffset(): Offset = EclFilesOffset(Nil)
  override def latestOffset(): Offset = EclFilesOffset(listNow())
  override def deserializeOffset(json: String): Offset =
    EclFilesOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[EclFilesOffset].files.toSet
    end.asInstanceOf[EclFilesOffset].files
      .filterNot(seen)
      .map(f => EclCaseInputPartition(f,
        EclBinaryDataSource.caseIdOf(kind, f)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EclBinaryReaderFactory(kind, vectors, mapaxes, required, datePred,
      wells, vectorSel)
}

/** The processed-file SET. Equality and hashing go through the sorted
  * canonical form (NOT the case-class structural members): the engine
  * compares a freshly listed offset against one deserialized from the
  * checkpoint log, and those can carry the same set in different Seq
  * orders — order-sensitive equality would schedule a spurious empty
  * batch on every restart. */
case class EclFilesOffset(files: Seq[String]) extends Offset {
  private lazy val canonical: Vector[String] = files.sorted.toVector
  override def json(): String =
    canonical.map(f => "\"" + f.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\"").mkString("[", ",", "]")
  override def equals(o: Any): Boolean = o match {
    case e: EclFilesOffset => e.canonical == canonical
    case _ => false
  }
  override def hashCode(): Int = canonical.hashCode
}

object EclFilesOffset {
  private val Esc = "\\\\u([0-9a-fA-F]{4})|\\\\(.)".r
  def fromJson(json: String): EclFilesOffset = {
    val t = json.trim
    require(t.startsWith("[") && t.endsWith("]"), s"bad files offset: $json")
    val files = "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(t)
      .map(m => Esc.replaceAllIn(m.group(1), e =>
        // decode the FULL escape set json() emits: \uXXXX and \<char>
        java.util.regex.Matcher.quoteReplacement(
          if (e.group(1) != null) Integer.parseInt(e.group(1), 16).toChar.toString
          else e.group(2))))
      .toVector
    EclFilesOffset(files)
  }
}
