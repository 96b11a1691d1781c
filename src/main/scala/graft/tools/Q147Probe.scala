package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Isolates q147's 13.6 s single-task stream-write stage (StageProfile
  * round-13 measurement): times the SAME Gopher-scored frame through
  * (a) a batch noop sink, (b) a batch partitioned-parquet write,
  * (c) the streaming parquet sink q147 uses, (d) the streaming sink
  * WITHOUT partitionBy, (e) the streaming sink fed by a pre-split
  * multi-file copy of the corpus (source parallelism probe).
  */
object Q147Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("q147-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextAnalytics.{gopherRulesOf => gr}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val root = java.nio.file.Files.createTempDirectory("q147probe").toString

    def scoredBatch = gr(
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("source")), keep = Seq("source"))
      .filter(col("pass"))
      .select(col("doc_id"), col("n_words"), col("g3_distinct"), col("source"))

    def scoredObserved = gr(
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("source")), keep = Seq("source"))
      .observe("q147_probe_" + System.nanoTime(), count(lit(1)).as("n"))
      .filter(col("pass"))
      .select(col("doc_id"), col("n_words"), col("g3_distinct"), col("source"))

    t("warmup batch noop")(scoredBatch.write.format("noop").mode("overwrite").save())
    t("batch noop")(scoredBatch.write.format("noop").mode("overwrite").save())
    t("batch noop with observe barrier")(
      scoredObserved.write.format("noop").mode("overwrite").save())
    t("batch noop with observe barrier (2)")(
      scoredObserved.write.format("noop").mode("overwrite").save())
    t("batch partitioned write")(scoredBatch.write.partitionBy("source")
      .mode("overwrite").parquet(s"$root/batch"))

    def streamOnce(label: String, partitioned: Boolean, src: String): Unit = t(label) {
      val out = s"$root/$label/corpus"; val cp = s"$root/$label/cp"
      val scored = gr(
        graft.streaming.EventStreams.readDocuments(spark, src)
          .select(col("doc_id"), col("text"), col("source")), keep = Seq("source"))
        .filter(col("pass"))
        .select(col("doc_id"), col("n_words"), col("g3_distinct"), col("source"))
      val w0 = scored.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow())
      val q = (if (partitioned) w0.partitionBy("source") else w0).start()
      q.awaitTermination()
    }
    streamOnce("stream partitioned (q147 shape)", partitioned = true, dir)
    streamOnce("stream flat", partitioned = false, dir)

    // multi-file source: split documents.parquet 8 ways, stream that
    val split = s"$root/split"
    graft.sources.Tables.documents(spark, dir).repartition(8)
      .write.parquet(s"$split/documents.parquet")
    streamOnce("stream partitioned, 8-file source", partitioned = true, split)
    spark.stop()
  }
}
