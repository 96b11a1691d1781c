package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Stage-level profiler (guide §1/§7): runs each named query once (after
  * a warmup execution of the same query, so JIT/codegen cost separates
  * from steady-state) with a listener capturing per-stage task metrics —
  * wall span, summed executor run time, GC, shuffle read/write bytes,
  * spill, peak execution memory, task count. Prints the stages of the
  * MEASURED run sorted by wall span so the hot stage is the first line.
  *
  * Usage: runMain graft.tools.StageProfile q203_suffix_repeats [more...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      GRAFT_PROFILE_FULL=1 to execute the query's own plan (toRdd.count).
  */
object StageProfile {
  private case class StageRow(id: Int, name: String, wallMs: Long,
    tasks: Int, runMs: Long, gcMs: Long, shRead: Long, shWrite: Long,
    inBytes: Long, spillMem: Long, spillDisk: Long, peakExec: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // checkpoint checksums off: measured r13 state-commit serialization
      // (see Bench.scala) — same setting everywhere queries run
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val buf = ArrayBuffer[StageRow]()
    var capturing = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (capturing) {
          val si = ev.stageInfo
          val m = si.taskMetrics
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          buf.synchronized {
            buf += StageRow(si.stageId,
              si.name.linesIterator.next().take(100), wall, si.numTasks,
              m.executorRunTime, m.jvmGCTime,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten,
              m.inputMetrics.bytesRead,
              m.memoryBytesSpilled, m.diskBytesSpilled, m.peakExecutionMemory)
          }
        }
    })

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val full = sys.env.contains("GRAFT_PROFILE_FULL")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      def once(): Long = {
        val df = fn(spark, sfDir)
        if (full) df.queryExecution.toRdd.count() else df.count()
      }
      once(); cleanup() // warmup
      // the listener bus is async: drain it at each capture-flag flip so
      // warmup stragglers don't contaminate the window and the measured
      // run's own tail events aren't dropped (ADVICE r13)
      org.apache.spark.graftshim.ListenerBusDrain.drain(spark.sparkContext)
      buf.clear(); capturing = true
      val t0 = System.nanoTime()
      val rows = once()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerBusDrain.drain(spark.sparkContext)
      capturing = false
      cleanup()
      println(f"\n===== $name rows=$rows wall=$wall%.3f s  stages=${buf.size} =====")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"tasks"}%5s ${"run_ms"}%8s " +
        f"${"gc_ms"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"in_MB"}%7s " +
        f"${"spill_MB"}%8s ${"peak_MB"}%8s  name")
      val rowsSorted = buf.sortBy(-_.wallMs)
      for (r <- rowsSorted.take(25)) {
        println(f"${r.id}%6d ${r.wallMs}%8d ${r.tasks}%5d ${r.runMs}%8d " +
          f"${r.gcMs}%6d ${r.shRead / 1e6}%7.1f ${r.shWrite / 1e6}%7.1f " +
          f"${r.inBytes / 1e6}%7.1f ${(r.spillMem + r.spillDisk) / 1e6}%8.1f " +
          f"${r.peakExec / 1e6}%8.1f  ${r.name}")
      }
      val totWall = buf.map(_.wallMs).sum
      val totRun = buf.map(_.runMs).sum
      println(f"-- stage wall sum=${totWall / 1e3}%.2f s, executor run sum=" +
        f"${totRun / 1e3}%.2f s (query wall $wall%.3f s; gaps = driver/plan time)")
    }
    spark.stop()
  }
}
