package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import scala.collection.mutable.ArrayBuffer

/** Per-MICRO-BATCH duration attribution for the streaming gates (guide
  * §1 measure-first, aimed at the per-batch FIXED cost the r13 verdict
  * flags): runs each named gate query once after a warmup and prints,
  * for every micro-batch the engine executed, the engine's own
  * durationMs breakdown (triggerExecution, queryPlanning, walCommit,
  * commitOffsets, getBatch, latestOffset, addBatch) plus state-operator
  * commit/update times. This is the engine-side complement of
  * StageProfile: stage metrics see executor work, this sees the
  * driver-side per-batch overhead (planning + WAL + state commit) that
  * never appears in any stage.
  *
  * Usage: tools/run.sh graft.tools.StreamBatchProbe q163_stream_ttl_dedup ...
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object StreamBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-batch-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class BatchRow(query: String, batchId: Long, rows: Long,
      durations: Map[String, Long], stateMs: Seq[(Long, Long, Long, Long)])
    val buf = ArrayBuffer[BatchRow]()
    @volatile var capturing = false
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = {}
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {}
      override def onQueryProgress(e: QueryProgressEvent): Unit = if (capturing) {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val durs = p.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap
        val st = p.stateOperators.toSeq.map(s =>
          (s.numRowsTotal, s.commitTimeMs, s.allUpdatesTimeMs, s.allRemovalsTimeMs))
        buf.synchronized { buf += BatchRow(p.name, p.batchId, p.numInputRows, durs, st) }
      }
    })

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // A/B knob: override the adaptive state-partition target (bytes per
    // partition) so partition-count sensitivity can be measured without
    // recompiling — e.g. GRAFT_STREAM_BPP=262144 gives ~8 partitions for
    // a 2 MB source where the 16 MB default gives 1.
    sys.env.get("GRAFT_STREAM_BPP").foreach { v =>
      spark.conf.set(graft.streaming.StreamTune.BytesPerPartitionKey, v)
      println(s"[probe] ${graft.streaming.StreamTune.BytesPerPartitionKey}=$v")
    }
    val runs = sys.env.getOrElse("GRAFT_PROBE_RUNS", "1").toInt
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      def once(): Long = fn(spark, sfDir).count()
      once(); cleanup() // warmup
      Thread.sleep(500) // streaming listener bus is async — let warmup events land
      // min-of-N walls (host variance discipline); batch table from the last run
      var rows = 0L
      var wall = Double.MaxValue
      val walls = (1 to runs).map { _ =>
        buf.synchronized(buf.clear()); capturing = true
        val t0 = System.nanoTime()
        rows = once()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // drain the async streaming listener bus
        capturing = false
        cleanup()
        wall = math.min(wall, w)
        w
      }
      if (runs > 1)
        println(f"[probe] $name walls: ${walls.map(w => f"$w%.3f").mkString(", ")} (min $wall%.3f)")
      val batches = buf.synchronized(buf.toVector)
      println(f"\n===== $name rows=$rows wall=$wall%.3f s  batches=${batches.size} =====")
      val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
        "latestOffset", "walCommit", "commitOffsets", "addBatch")
      println(f"${"batch"}%6s ${"rows"}%7s " + keys.map(k => f"${k.take(10)}%11s").mkString +
        "  state(rows,commit,upd,rm ms)")
      for (b <- batches.sortBy(x => (x.query, x.batchId))) {
        val d = keys.map(k => f"${b.durations.getOrElse(k, -1L)}%11d").mkString
        val st = b.stateMs.map { case (n, c, u, r) => s"($n,$c,$u,$r)" }.mkString(" ")
        println(f"${b.batchId}%6d ${b.rows}%7d $d  $st")
      }
      val totTrig = batches.map(_.durations.getOrElse("triggerExecution", 0L)).sum
      val totPlan = batches.map(_.durations.getOrElse("queryPlanning", 0L)).sum
      val totWal = batches.map(_.durations.getOrElse("walCommit", 0L)).sum +
        batches.map(_.durations.getOrElse("commitOffsets", 0L)).sum
      val totAdd = batches.map(_.durations.getOrElse("addBatch", 0L)).sum
      println(f"-- sums: triggerExecution=${totTrig / 1e3}%.2f s, " +
        f"queryPlanning=${totPlan / 1e3}%.2f s, wal+commit=${totWal / 1e3}%.2f s, " +
        f"addBatch=${totAdd / 1e3}%.2f s (query wall $wall%.3f s; " +
        "wall - triggerSum = staging + batch-tail + query start/stop)")
    }
    spark.stop()
  }
}
