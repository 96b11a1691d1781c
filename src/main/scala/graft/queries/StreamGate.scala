package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming under the oracle gate (SURVEY.md §2.10).
  *
  * The streaming extension previously rested on ScalaTest alone; q58 runs
  * the ACTUAL streaming engine — file source, event-time tumbling window,
  * stateful aggregation, memory sink — to completion over the static
  * events table with `Trigger.AvailableNow`, and the DuckDB oracle replays
  * the same aggregate as a batch GROUP BY. A hash match proves the
  * streaming pipeline computes exactly the batch answer (the
  * batch/stream-parity contract the DataFrame API promises; reference
  * summary-style aggregations run incrementally over per-report-step
  * files the same way).
  */
object StreamGate {

  /** q58: event-time tumbling 1-day window aggregation executed BY THE
    * STREAMING ENGINE (readStream → watermark → window groupBy →
    * memory sink, one AvailableNow run). Float totals use the exact-long
    * trick (Σ round(value·10⁴) as BIGINT, divided once at the end) so the
    * result is association-order-free — identical no matter how many
    * micro-batches the state accumulated over, and identical to the
    * oracle's batch sum.
    *
    * Mode honesty: this HARNESS run uses complete output mode because a
    * finite replay must surface every window's final value in one
    * readable table — and in complete mode the watermark does NOT evict
    * state (Spark retains all windows, fine for a bounded gate input).
    * The production form of the same upstream plan is APPEND mode, where
    * the 2-hour watermark closes windows, evicts their state (state =
    * O(open windows × types)) and emits each window once to a files/
    * kafka sink; append can't serve the gate because the final windows
    * only emit after the watermark passes them, which a finite replay's
    * last batch never triggers.
    */
  def q58StreamWindow(s: SparkSession, dir: String): DataFrame = {
    val events = graft.streaming.EventStreams.readEvents(s, dir)
    val agg = graft.streaming.EventStreams.dailyActivityExact(
      events.withWatermark("ts", "2 hours"))
    val sink = "q58_sink"
    s.catalog.dropTempView(sink) // rerun hygiene (Bench sweeps 3×)
    val q = agg.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_stream_window" -> (q58StreamWindow _),
  )

  val oracleSql: Map[String, String] = Map(
    "q58_stream_window" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
