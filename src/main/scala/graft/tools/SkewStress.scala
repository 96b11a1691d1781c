package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew evidence: a fact⋈dim join where 40% of the fact rows share ONE
  * key — the shape that turns a shuffle join into a single-straggler
  * stage. Runs the identical query with AQE skew-join handling OFF and
  * ON (broadcast disabled so the join actually shuffles) and reports
  * wall times plus whether the final adaptive plan split the skewed
  * partition. This is the measured form of the "salting or AQE
  * skew-join" scale lever: on Spark ≥3.2 the declarative plan + AQE
  * handles the skew at runtime, no manual salt column needed — while
  * skewed AGGREGATION keys need no treatment at all: partial
  * aggregation collapses the hot key map-side (also shown here: the
  * hot-key groupBy is no slower than the uniform-key one — it is
  * faster, having fewer distinct keys to shuffle).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.SkewStress [rows]
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      // make the skew detectable at test scale (defaults target 256 MB
      // partitions; this corpus is ~100 MB total)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // the post-join aggregate reuses the join's partitioning, so AQE
      // would veto the split (it adds a shuffle) unless forced — forcing
      // is the right trade at scale: one extra exchange of the hot
      // partition beats a straggler holding the whole stage
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 40% of fact rows land on key 1; the rest spread over the ~60k
    // residues of pmod(id, 100000) whose id%100 >= 40 (the other ids
    // were captured by the hot branch)
    val fact = spark.range(n).select(
      when(pmod($"id", lit(100)) < 40, 1L)
        .otherwise(pmod($"id", lit(100000))).as("k"),
      ($"id" % 1000).cast("double").as("v"))
    val dim = spark.range(100000).select($"id".as("k"),
      md5($"id".cast("string")).as("attr"))
    def q() = fact.join(dim, "k")
      .groupBy($"attr").agg(sum($"v").as("sv"), count(lit(1)).as("cnt"))

    def run(): (Double, Boolean) = {
      // execute THIS df's plan (count() would build its own) so the
      // final adaptive plan — with any skew-split shuffle reads — is
      // inspectable afterwards
      val qe = q().queryExecution
      val t0 = System.nanoTime(); qe.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val finalPlan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      (dt, finalPlan.toLowerCase.contains("skew"))
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (tOff, _) = Seq(run(), run()).minBy(_._1)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (tOn, split) = Seq(run(), run()).minBy(_._1)
    println(f"SKEW off: time=$tOff%.2fs")
    println(f"SKEW on:  time=$tOn%.2fs splitDetected=$split")

    // hot-key AGGREGATION needs no salt: partial agg collapses the hot
    // key map-side. Execute via toRdd (Dataset.count() would prune the
    // sum aggregate away and time a different plan), min-of-2 per
    // distribution, SAME workload family for both sides.
    def agg(col0: org.apache.spark.sql.Column): Double = {
      val qe = spark.range(n)
        .select(col0.as("k"), ($"id" % 1000).cast("double").as("v"))
        .groupBy("k").agg(sum($"v")).queryExecution
      val t0 = System.nanoTime(); qe.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val hotCol = when(pmod($"id", lit(100)) < 40, 1L)
      .otherwise(pmod($"id", lit(100000)))
    val uniformCol = pmod($"id", lit(100000))
    val hot = Seq(agg(hotCol), agg(hotCol)).min
    val uniform = Seq(agg(uniformCol), agg(uniformCol)).min
    println(f"SKEW agg: hotkey=$hot%.2fs uniform=$uniform%.2fs (partial agg absorbs the skew)")
    spark.stop()
  }
}
