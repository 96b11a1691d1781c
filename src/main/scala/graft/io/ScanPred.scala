package graft.io

/** A pushed-down DATE constraint for the binary readers, in epoch-day
  * space — the serializable carrier between the DataSourceV2
  * `SupportsPushDownFilters` surface (driver side) and the per-case
  * decode kernels (executor side). The kernels use it to SKIP decoding
  * whole report steps / report groups at the byte level: UNRST judges
  * each SEQNUM group from its INTEHEAD clock before any cell-vector
  * payload is read (the reference's `dates2rstindices` discipline,
  * grid.py:54-123 — an INTEHEAD-only pre-scan decides which steps are
  * decoded at all), RFT judges each TIME group from its DATE keyword,
  * and UNSMRY pre-scans ONLY the TIME element of each PARAMS record
  * ([[EclKw.streamFloatElement]] — 4 bytes per step instead of the full
  * nvec·4-byte payload) before the main pass decodes the selected steps.
  *
  * Semantics are exact at the step level — every row of a step shares
  * the step's DATE, so source-side filtering can never split a step —
  * and `keep(null)` is false for any non-trivial predicate (an
  * equality/range filter never matches a null DATE, matching Spark's
  * filter semantics for the nullable RFT DATE column).
  */
final case class DatePred(minDay: Long, maxDay: Long, inDays: Option[Set[Long]]) {
  def trivial: Boolean =
    minDay == Long.MinValue && maxDay == Long.MaxValue && inDays.isEmpty

  def keepDay(e: Long): Boolean =
    e >= minDay && e <= maxDay && inDays.forall(_.contains(e))

  def keep(d: java.sql.Date): Boolean =
    if (d == null) trivial else keepDay(d.toLocalDate.toEpochDay)

  /** Tighten with `DATE = day` (conjunction). */
  def withEqual(e: Long): DatePred =
    withIn(Set(e))

  /** Tighten with `DATE IN (days)` (conjunction: sets intersect). */
  def withIn(days: Set[Long]): DatePred =
    copy(inDays = Some(inDays.fold(days)(_ intersect days)))

  def withMin(e: Long): DatePred = copy(minDay = math.max(minDay, e))
  def withMax(e: Long): DatePred = copy(maxDay = math.min(maxDay, e))
}

object DatePred {
  val All: DatePred = DatePred(Long.MinValue, Long.MaxValue, None)
}

/** Decode-skip evidence for the pushdown specs: JVM-wide counters of
  * payloads the binary kernels ACTUALLY decoded (not rows emitted), so a
  * test can prove a pushed DATE/WELL filter skipped bytes — a dropped
  * row count alone can't distinguish decode-then-filter from true seek-
  * past. LongAdders: contention-free on the 32 local executor threads,
  * nanoseconds per increment, so the production path keeps them
  * unconditionally (on a real cluster each executor JVM just counts its
  * own share).
  */
private[graft] object DecodeStats {
  /** A JVM-global sum plus a per-thread running total. The global sum is
    * the spec evidence (unchanged API); the thread total lets a DSv2
    * [[org.apache.spark.sql.connector.read.PartitionReader]] report its
    * OWN decode work as a custom task metric by snapshotting before /
    * after — correct because Spark consumes one partition reader from
    * exactly one task thread, and the kernels decode on that thread.
    * (32 concurrent local tasks interleave the GLOBAL adder, so a
    * global before/after delta would mis-attribute work across tasks.)
    */
  private[graft] final class TaskLocalAdder {
    private val global = new java.util.concurrent.atomic.LongAdder
    private val local = new ThreadLocal[Array[Long]] {
      override def initialValue(): Array[Long] = Array(0L)
    }
    def increment(): Unit = add(1L)
    def add(n: Long): Unit = { global.add(n); local.get()(0) += n }
    def sum(): Long = global.sum()
    def reset(): Unit = global.reset() // thread totals only feed deltas
    def threadTotal: Long = local.get()(0)
  }
  /** UNRST cell-vector payloads decoded (per selected vector per step). */
  val unrstVecPayloads = new TaskLocalAdder
  /** RFT data-vector payloads decoded (per selected vector per group). */
  val rftVecPayloads = new TaskLocalAdder
  /** UNSMRY PARAMS payloads FULLY decoded (the pre-scan's single-element
    * peeks are not counted — they are the point of the optimization). */
  val unsmryParams = new TaskLocalAdder
  /** UNSMRY PARAMS float SLOTS partially decoded by the VECTOR-pushdown
    * path ([[EclKw.streamFloatSlots]]) — counts ELEMENTS, not records,
    * so a spec can prove the decoded-byte drop is ~nvec-fold: a
    * one-vector read adds 2 per selected step (TIME + the vector)
    * where the full decode path would have read nvec. */
  val unsmryParamSlots = new TaskLocalAdder
  /** EGRID active cells whose corner-point GEOMETRY was computed (one
    * add per slab at its active count — a property-only projection must
    * leave this untouched: no pillar interpolation, and the ZCORN/COORD
    * payloads never decode at all). */
  val egridGeomCells = new TaskLocalAdder
}
