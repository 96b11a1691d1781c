package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnnPq, BinaryGate, Chunking, Curation, Deck, DedupSim, Extras, Media, ModuleOracles, Relational, ReservoirGate, Sketches, StreamGate, TextAnalytics, Tokenize}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-family query registries; each entry
  * demonstrates one operator from SURVEY.md §2 (or a scale-pipeline
  * operator: dedup / similarity / text analysis). `oracleSql` holds the
  * DuckDB-equivalent SQL with identical column names and numeric contracts
  * (BIGINT ids/counts, DOUBLE aggregates rounded identically post-agg).
  */
object SparkEntry {

  /** Flagship on sf=0.001 (driver smoke-checks rows>0): monthly-resampled
    * event activity — the reference's summary-resample flagship shape
    * (summary.py:195-290): generated date dimension ⋈ aggregate, zero-filled.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q08Resample(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalytics.queries ++ DedupSim.queries ++ Extras.queries ++
      Media.queries ++ Deck.queries ++ ModuleOracles.queries ++
      StreamGate.queries ++ BinaryGate.queries ++ ReservoirGate.queries ++
      Chunking.queries ++ Curation.queries ++ AnnPq.queries ++ Tokenize.queries ++
      Sketches.queries

  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalytics.oracleSql ++ DedupSim.oracleSql ++ Extras.oracleSql ++
      Media.oracleSql ++ Deck.oracleSql ++ ModuleOracles.oracleSql ++
      StreamGate.oracleSql ++ BinaryGate.oracleSql ++ ReservoirGate.oracleSql ++
      Chunking.oracleSql ++ Curation.oracleSql ++ AnnPq.oracleSql ++ Tokenize.oracleSql ++
      Sketches.oracleSql
}
