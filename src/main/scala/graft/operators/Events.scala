package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream operators over the `events` table: tumbling-window
  * aggregation and gap-based sessionization — the batch halves of the
  * streaming pair (the Structured Streaming variant of the window
  * aggregation is q28 in [[Streaming]]).
  *
  * Timestamps: `events.ts` arrives as epoch-nanosecond longs (see
  * [[graft.sources.Tables]]); all window math is integer µs, so the
  * DuckDB oracle (`epoch_us(ts)`) matches exactly. `value` doubles are
  * aggregated in integer cents (Relational's discipline).
  */
object Events {

  private val DayUs = 86400000000L // µs per day
  private val SessionGapUs = 43200000000L // 12 h — calibrated to the
  // corpus' median inter-event gap (~7.3 h) so users genuinely split
  // into multi-event sessions rather than one-event-per-session.

  /** q26: tumbling daily window per event type — count, distinct users,
    * exact-cents value sum. One shuffle on (bucket, type) with map-side
    * partials; the classic streaming-shaped aggregation run as batch.
    */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"),
        round(col("value") * 100, 0).cast("long").as("vc"))
      .withColumn("day_bucket", expr("us DIV " + DayUs))
      .groupBy(col("day_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(col("vc")).cast("double") / 100.0).as("sum_value"))

  /** q27: gap-based sessionization — a new session starts after a
    * >12 h silence. lag + running sum over (user, time) windows; the
    * shuffle is one hash partition by user_id, and per-user state is
    * bounded (the streaming twin would be flatMapGroupsWithState).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"))
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    e.withColumn("prev", lag(col("us"), 1).over(byTime))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_sess")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** q35: AS-OF JOIN — for every order, the user's latest event at or
    * before the order timestamp. Spark has no native as-of join; the
    * scalable composition is union-tag + one keyed window: both sides
    * shuffle ONCE on the user key, sort within partition by time, and a
    * running `last(..., ignoreNulls)` carries the most recent event
    * forward onto each order row. No range-join explosion, no
    * per-order probe — cost is a single sort-merge pass, the same shape
    * a native as-of physical operator would use. Events are
    * pre-collapsed to max(event_id) per (user, µs) so ties are
    * deterministic in both engines (the DuckDB oracle uses its native
    * ASOF LEFT JOIN).
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("u"), expr("ts DIV 1000").as("us"),
        col("event_id"))
      .groupBy(col("u"), col("us")).agg(max(col("event_id")).as("event_id"))
      .select(col("u"), col("us"), col("event_id"),
        lit(1).as("is_event"), lit(null).cast("long").as("o_orderkey"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey").as("u"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_event"),
        col("o_orderkey"))
    // at equal µs the event sorts before the order, so "at or before"
    // includes same-instant events
    val w = Window.partitionBy(col("u"))
      .orderBy(col("us").asc, col("is_event").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("last_event_id",
        last(when(col("is_event") === 1, col("event_id")), ignoreNulls = true)
          .over(w))
      .withColumn("last_event_us",
        last(when(col("is_event") === 1, col("us")), ignoreNulls = true)
          .over(w))
      .filter(col("is_event") === 0)
      .select(col("o_orderkey"), col("u").as("o_custkey"),
        col("last_event_id"), col("last_event_us"))
  }

  /** q40: JSON payload extraction — `props` holds `{"k": <int>}`;
    * extract, type, and aggregate per event type. `get_json_object` is
    * row-local (codegen'd Jackson path eval); one small shuffle on the
    * 5-value event_type key.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_window_agg" -> windowAgg,
    "q27_sessionize" -> sessionize,
    "q35_asof_join" -> asofJoin,
    "q40_json_extract" -> jsonExtract)

  private val windowSql =
    s"""SELECT epoch_us(ts) // $DayUs AS day_bucket, event_type,
       |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin

  private val sessionSql =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) us FROM events),
       |g AS (SELECT user_id, event_id, us,
       |        lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) prev FROM e),
       |n AS (SELECT user_id, event_id, us,
       |        CASE WHEN prev IS NULL OR us - prev > $SessionGapUs THEN 1 ELSE 0 END ns FROM g),
       |s AS (SELECT user_id, us,
       |        CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) session_no FROM n)
       |SELECT user_id, session_no, count(*) AS n_events,
       |       min(us) AS start_us, max(us) AS end_us,
       |       max(us) - min(us) AS duration_us
       |FROM s GROUP BY user_id, session_no""".stripMargin

  private val asofSql =
    """WITH e AS (SELECT user_id u, epoch_us(ts) us, max(event_id) event_id
      |           FROM events GROUP BY 1, 2),
      |o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) us FROM orders)
      |SELECT o.o_orderkey, o.o_custkey,
      |       e.event_id AS last_event_id, e.us AS last_event_us
      |FROM o ASOF LEFT JOIN e ON o.o_custkey = e.u AND e.us <= o.us""".stripMargin

  private val jsonSql =
    """SELECT event_type,
      |  count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |  min(k) AS min_k, max(k) AS max_k,
      |  count(DISTINCT k) AS n_distinct_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "q26_window_agg" -> windowSql,
    "q27_sessionize" -> sessionSql,
    "q35_asof_join" -> asofSql,
    "q40_json_extract" -> jsonSql)
}
