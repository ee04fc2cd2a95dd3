package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time / JSON / sessionization / as-of surface over the `events` fixture
  * (SURVEY §2.6 date-time + JSON — the reference itself has no temporal
  * ops; this is the engine's extended surface for event data).
  *
  * Scale notes: every query here shuffles at most once, on its natural
  * key (`user_id` or the group key). Sessionization and the as-of join
  * are the classic "sort within key partitions" pattern — Spark sorts
  * within partitions after a single hash exchange; no global sort.
  */
object Events {

  /** Tumbling 1-hour aggregate per event type (batch analog of the
    * Structured Streaming windowed agg in graft.streaming).
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** JSON extraction from the `props` column + aggregate. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1).otherwise(0)).as("n_high"))
      .orderBy(col("event_type"))

  /** Sessionization: a session breaks after a >30-minute gap per user.
    * lag + cumulative-sum-of-flags, then per-user session stats.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us")) > 1800L * 1000000L).cast("int"))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"))
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** As-of join: each `error` event matched to the latest `purchase` by
    * the same user at-or-before its timestamp.
    *
    * Spark-first formulation: rather than an O(errors × purchases)
    * range join, union both streams, sort within user partitions, and
    * carry the last purchase forward with `last(..., ignoreNulls)` —
    * one shuffle on `user_id`, linear work, identical semantics to
    * DuckDB's ASOF JOIN (ties at equal ts: purchase sorts first).
    */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val tagged = ev
      .filter(col("event_type").isin("error", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "purchase").as("is_purchase"))
    val w = Window.partitionBy(col("user_id"))
      // purchase before error at the same ts → `<=` as-of semantics
      .orderBy(col("ts").asc, col("is_purchase").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("purchase_id",
        last(when(col("is_purchase"), col("event_id")), ignoreNulls = true).over(w))
      .withColumn("purchase_us",
        last(when(col("is_purchase"), unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(!col("is_purchase") && col("purchase_id").isNotNull)
      .select(
        col("event_id"), col("user_id"), col("purchase_id"),
        (unix_micros(col("ts")) - col("purchase_us")).as("lag_us"))
      .orderBy(col("event_id"))
  }

  /** Banded range join: for each click, the number of views by the same
    * user in the preceding 5 minutes.
    *
    * Spark-first formulation: a raw interval theta-join is O(clicks ×
    * views) per user. Instead both sides bucket into 5-minute bins; a
    * view lands in ONE bin, a click probes its own bin and the previous
    * one (the window can only span two bins), so the join is an
    * EQUI-join on (user_id, bin) with a residual timestamp filter —
    * partition-prunable, shuffle-bounded, and each (click, view) pair
    * is examined exactly once. This is the standard map of interval
    * joins onto hash-partitioned engines.
    */
  def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("c_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
    rangeJoinBanded(clicks, views, 300000000L).orderBy("event_id")
  }

  /** Core of the banded interval join: count `views` (user_id, v_us)
    * with v_us ∈ (c_us − binUs, c_us] for every click (event_id,
    * user_id, c_us). Exposed for property tests (bin-boundary
    * semantics) — see eventsRangeJoin for the shape rationale.
    */
  def rangeJoinBanded(clicks: DataFrame, views: DataFrame, binUs: Long): DataFrame = {
    val c = clicks
      .withColumn("bin", explode(array(
        expr(s"c_us div $binUs"), expr(s"c_us div $binUs") - 1)))
    val v = views.withColumn("bin", expr(s"v_us div $binUs"))
    c.join(v, Seq("user_id", "bin"), "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(when(
        col("v_us") > col("c_us") - binUs && col("v_us") <= col("c_us"),
        lit(1))).as("n_views"))
  }

  /** Pivot: event types to columns, daily value totals (DECIMAL-routed). */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .orderBy("day")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_pivot" -> (eventsPivot _),
    "events_hourly" -> (eventsHourly _),
    "events_json" -> (eventsJson _),
    "events_sessionize" -> (eventsSessionize _),
    "events_asof" -> (eventsAsof _),
    "events_range_join" -> (eventsRangeJoin _),
  )

  def oracles: Map[String, String] = Map(
    // naive interval theta-join — the semantic ground truth the banded
    // equi-join must reproduce exactly
    "events_range_join" ->
      """SELECT c.event_id, c.user_id, count(v.ts) AS n_views
        |FROM events c LEFT JOIN events v
        |  ON v.user_id = c.user_id AND v.event_type = 'view'
        |  AND CAST(v.ts AS TIMESTAMP) > CAST(c.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
        |  AND CAST(v.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
        |WHERE c.event_type = 'click'
        |GROUP BY 1, 2 ORDER BY c.event_id""".stripMargin,
    "events_pivot" -> {
      val cols = Seq("click", "view", "purchase", "signup", "error").map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS $t")
        .mkString(",\n|  ")
      s"""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         |  $cols
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin
    },
    "events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
        |  CAST(sum(CASE WHEN CAST(props->>'k' AS INTEGER) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_sessionize" ->
      """WITH t AS (
        |  SELECT user_id,
        |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC))
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_asof" ->
      """SELECT e.event_id, e.user_id, p.event_id AS purchase_id,
        |       epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP)) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND CAST(e.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
        |ORDER BY e.event_id""".stripMargin,
  )
}
