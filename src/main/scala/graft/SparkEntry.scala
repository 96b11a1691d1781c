package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ops
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry demonstrates one operator family from SURVEY.md §2
  * on the driver's synthetic tables; `oracleSql` holds the DuckDB-equivalent
  * SQL. Column names and numeric types are aligned on both sides (BIGINT for
  * counts/ids, DOUBLE rounded post-aggregation for float sums) so the
  * driver's sorted-column value hash matches.
  */
object SparkEntry {

  /** Flagship: monthly-resampled event activity per type — generated date
    * dimension (resample, SURVEY §2.9) left-joined to a groupBy, zero-filled.
    * Mirrors the reference's summary-resample flagship (summary.py:195-290).
    */
  def entry(spark: SparkSession): DataFrame =
    flagship(spark, "/root/testdata/sf0.001")

  def flagship(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val months = Ops.dateDimension(
      ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")), "mn", "mx", "monthly")
    val agg = ev.groupBy(date_trunc("month", col("ts")).as("DATE"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
    months.crossJoin(Tables.events(s, dir).select(col("event_type")).distinct())
      .join(agg, Seq("DATE", "event_type"), "left")
      .select(col("DATE"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy(col("DATE"), col("event_type"))
  }

  // ---- §2.4 A1: groupBy aggregation (sum/avg/count/countDistinct) --------
  private def q01Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---- §2.3 J3/J4: multi-way equi-join, broadcast dims, filter pushdown --
  private def q02Join(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" && col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("n_name"))
  }

  // ---- §2.7 R1: range unroll via explode(sequence) -----------------------
  private def q03Unroll(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.lineitem(s, dir).groupBy(col("l_orderkey").as("orderkey"))
      .agg(max(col("l_linenumber")).cast("long").as("n"))
    Ops.unrollRange(n.withColumn("one", lit(1L)), "one", "n", "k")
      .select(col("orderkey"), col("n"), col("k"))
      .orderBy(col("orderkey"), col("k"))
  }

  // ---- §2.3 J9-J12: as-of join (latest right row with ts <= left ts) -----
  private def q04Asof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"), col("value").as("error_value"))
    Ops.asofJoinLe(purchases, errors, Seq("user_id"),
        leftTime = "ts", rightTime = "error_ts",
        leftIdCols = Seq("event_id"), rightCols = Seq("error_ts", "error_value"))
      .select(col("l.event_id").as("event_id"), col("l.user_id").as("user_id"),
        col("l.ts").as("ts"), col("error_ts"), col("error_value"))
      .orderBy(col("event_id"))
  }

  // ---- §2.5 W1/W2: forward-fill via last(ignoreNulls) window -------------
  private def q05Ffill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("signup_value",
        when(col("event_type") === "signup", col("value")))
    Ops.ffill(ev, Seq("signup_value"), Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("event_id"), col("user_id"), col("ts"), col("signup_value"))
      .orderBy(col("event_id"))
  }

  // ---- §2.5 W3: status-change detection via lag --------------------------
  private def q06Changes(s: SparkSession, dir: String): DataFrame =
    Ops.changesOnly(Tables.events(s, dir), col("event_type"),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .orderBy(col("event_id"))

  // ---- §2.4 A6: last-wins dedup ------------------------------------------
  private def q07LastWins(s: SparkSession, dir: String): DataFrame =
    Ops.lastWinsDedup(Tables.orders(s, dir), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01Agg _),
    "q02_join" -> (q02Join _),
    "q03_unroll" -> (q03Unroll _),
    "q04_asof" -> (q04Asof _),
    "q05_ffill" -> (q05Ffill _),
    "q06_changes" -> (q06Changes _),
    "q07_lastwins" -> (q07LastWins _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS n_rows,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_join" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q03_unroll" ->
      """SELECT orderkey, n, unnest(generate_series(1, n)) AS k
         FROM (SELECT l_orderkey AS orderkey, CAST(max(l_linenumber) AS BIGINT) AS n
               FROM lineitem GROUP BY 1)
         ORDER BY orderkey, k""",
    "q04_asof" ->
      """SELECT p.event_id, p.user_id, p.ts, e.error_ts, e.error_value
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id AS e_user, ts AS error_ts, value AS error_value
                         FROM events WHERE event_type = 'error') e
           ON p.user_id = e.e_user AND p.ts >= e.error_ts
         ORDER BY p.event_id""",
    "q05_ffill" ->
      """SELECT event_id, user_id, ts,
         last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_value
         FROM events ORDER BY event_id""",
    "q06_changes" ->
      """SELECT event_id, user_id, ts, event_type FROM (
           SELECT event_id, user_id, ts, event_type,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events)
         WHERE prev IS NULL OR prev <> event_type
         ORDER BY event_id""",
    "q07_lastwins" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
  )
}
