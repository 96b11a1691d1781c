package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over a testdata scale-factor directory.
  *
  * Mirrors the reference's `ResdataFiles` lazy-open/memoize pattern
  * (/root/reference/src/res2df/resdatafiles.py:63-117) as a thin scan layer:
  * every read is a plain columnar parquet scan so Catalyst column pruning +
  * predicate pushdown reach the file format. At 100 TB the same call works
  * against a partitioned directory (`dir` = a table root with date/case
  * partitions) with no code change.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark rejects natively;
    * read it as a long and truncate to micros — identical to what DuckDB
    * (µs-precision timestamps) does with the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
