package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

import scala.collection.mutable.ArrayBuffer

/** Operative-plan dumps for queries whose `df.explain` is vacuous — the
  * r13 verdict's evidence gap: a streaming gate's returned frame shows
  * only the post-stream batch tail, and anything behind `localCheckpoint`
  * shows as one `Scan ExistingRDD` node. Every execution (micro-batches
  * included) posts `SparkListenerSQLExecutionStart` with the FULL
  * physical plan description, so capturing those events while a gate
  * runs yields the real per-batch executed plans.
  *
  * Usage: tools/run.sh graft.tools.StreamPlanDump <outDir> <query> ...
  * Writes `<outDir>/<query>.txt` containing every execution's plan in
  * submission order, each prefixed by its execution description line.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object StreamPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamPlanDump <outDir> <query> [query ...]")
    val outDir = java.nio.file.Paths.get(args.head)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val plans = ArrayBuffer[(Long, String, String)]() // (execId, description, plan)
    @volatile var capturing = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart if capturing =>
          plans.synchronized(plans += ((e.executionId, e.description, e.physicalPlanDescription)))
        case e: org.apache.spark.sql.execution.ui.SparkListenerSQLAdaptiveExecutionUpdate
            if capturing =>
          // AQE re-plans mid-execution: keep the LAST update per execution
          // (the final adaptive plan — what actually ran)
          plans.synchronized {
            val i = plans.lastIndexWhere(_._1 == e.executionId)
            if (i >= 0) plans(i) = ((e.executionId, plans(i)._2, e.physicalPlanDescription))
            else plans += ((e.executionId, "adaptive-update", e.physicalPlanDescription))
          }
        case _ =>
      }
    })

    for (name <- args.tail) {
      val fn = graft.SparkEntry.queries(name)
      plans.synchronized(plans.clear())
      org.apache.spark.graftshim.ListenerBusDrain.drain(spark.sparkContext)
      capturing = true
      val rows = fn(spark, sfDir).count()
      org.apache.spark.graftshim.ListenerBusDrain.drain(spark.sparkContext)
      capturing = false
      val captured = plans.synchronized(plans.toVector)
      val body = captured.map { case (id, desc, plan) =>
        s"########## execution $id: ${desc.linesIterator.take(1).mkString} ##########\n$plan"
      }.mkString("\n\n")
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"),
        s"== $name: ${captured.size} executions, result rows=$rows ==\n\n$body\n")
      println(s"[plandump] $name: ${captured.size} executions -> $outDir/$name.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
