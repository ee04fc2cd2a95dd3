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

  /** Daily volume anomaly flags — the ops-dashboard query every event
    * pipeline runs: per-(event_type, day) counts against the type's
    * exact median daily count, flagged when a day exceeds 2× median.
    * All inputs are exact integers; the median interpolates two
    * integers at most (identical percentile_cont definition on both
    * engines), and the flag compares against 2×median directly — no
    * streaming moment kernels, no order-dependent float sum (the
    * [[Relational.aggMoments]] discipline applied to anomaly
    * detection). Scale: two map-side-combined aggregates — days per
    * type is calendar-bounded, so the median side is a broadcast.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(n, 0.5)").as("med_daily"))
    daily.join(broadcast(med), "event_type")
      .select(col("event_type"), col("day"), col("n"), col("med_daily"),
        (col("n") > lit(2.0) * col("med_daily")).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Seasonality-adjusted volume anomalies — [[eventsAnomaly]] with the
    * day-of-week profile subtracted: a Saturday is judged against
    * Saturdays (the weekly cycle every product metric has), not the
    * all-days median that flags every weekend as anomalous or buries a
    * weekday spike. The flag is INTEGER-EXACT by cross-multiplication:
    * n > 2·mean(dow) ⟺ n·d_cnt > 2·d_sum — no division, no float
    * anywhere (the [[Relational.aggMoments]] discipline taken all the
    * way to the comparison). Day-of-week is ISO (1 = Monday) on both
    * engines: Spark `weekday()+1` ≡ DuckDB `isodow()`. Scale: the
    * (type, dow) profile is ≤ types×7 rows — a broadcast by
    * construction.
    */
  def eventsSeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", (expr("weekday(day)") + 1).cast("int"))
    val prof = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("d_sum"), count(lit(1)).as("d_cnt"))
    daily.join(broadcast(prof), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        (col("n") * col("d_cnt") > lit(2) * col("d_sum")).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** CDC/upsert compaction — latest row per (user, event_type) key,
    * the SCD-type-1 merge every warehouse ingest runs on a change
    * stream. Deterministic argmax by (ts, event_id): event_id is
    * unique, so ties cannot occur and `value` is carried, never
    * compared. Formulated as a map-side-combined struct-max AGGREGATE,
    * not row_number-over-window: the combine collapses each partition
    * to one row per live key before the exchange, so the shuffle
    * carries |keys| rows where the window formulation shuffles and
    * sorts every change record — the difference between compaction
    * and re-sorting the log at 100 TB.
    */
  def eventsCdcLatest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts").as("last_ts"), col("m.event_id").as("last_event_id"),
        col("m.value").as("last_value"))
      .orderBy("user_id", "event_type")

  /** Per-group top-k: the three most active users per event type —
    * the rank-filter window shape Spark 4's `WindowGroupLimit` rewrite
    * exists for: the filter `rn <= 3` is pushed INTO the window
    * operator, so each partition keeps a bounded per-group buffer
    * instead of ranking every user and filtering after (PlanSpec
    * asserts the rewrite fires). Ties break to the lower user_id —
    * pinned on both engines.
    */
  def eventsTopUsers(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id").asc)
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("rn").cast("int").as("rank"),
        col("user_id"), col("n"))
      .orderBy("event_type", "rank")
  }

  /** Exponentially-weighted daily volume per event type (α = 0.25) —
    * the smoothing baseline an alerting pipeline holds per series,
    * beside [[eventsAnomaly]]'s median flags. The fold runs inside the
    * engines' higher-order list functions over the day-ORDERED series,
    * so accumulation order is pinned by construction (Spark
    * `aggregate` and DuckDB `list_reduce` both fold left with the
    * first element as init — the lambda `s·0.75 + x·0.25` uses only
    * exact binary fractions, so every intermediate is the identical
    * double). Scale: per-(type, day) counts combine map-side; the
    * per-type series is calendar-bounded (≤ days rows), so the
    * collect-and-fold state is O(days) per group, never O(events).
    */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("ser"))
      .select(col("event_type"),
        size(col("ser")).as("n_days"),
        expr("element_at(ser, -1).n").as("last_n"),
        round(expr(
          """aggregate(
            |  slice(transform(ser, s -> CAST(s.n AS DOUBLE)), 2, size(ser) - 1),
            |  CAST(ser[0].n AS DOUBLE),
            |  (s, x) -> s * 0.75 + x * 0.25)""".stripMargin), 4).as("ewma"))
      .orderBy("event_type")
  }

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

  /** Event-stream ingest contract gate — the `docs_profile`/
    * `embed_contract`/`media_contract` shape for the events table,
    * completing the admission gate over every fixture family: ONE row
    * of per-shard counts a streaming ingest emits before admitting a
    * batch — volume, id uniqueness (n_event_ids must equal n_events),
    * user/type cardinalities, the event-time span a watermark policy
    * is set against, null-timestamp and bad-props counts (either
    * nonzero rejects the shard; `n_bad_props` counts rows whose props
    * are NULL, fail JSON parsing, or lack the contract key `k` —
    * Spark's `get_json_object` folds all three into one null, and the
    * oracle's sequential CASE with `json_valid` guards DuckDB's
    * error-on-malformed `->>` so both engines count the same rows on
    * any future fixture vintage), and the value range. One
    * narrow scan, one aggregate; the exact distincts swap for the HLL
    * sketch (`hll_distinct`) at 100 TB without changing the contract
    * shape (the docs_profile convention).
    */
  def eventsProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("event_id")).as("n_event_ids"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("n_null_ts"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      sum(when(get_json_object(col("props"), "$.k").isNull, 1L)
        .otherwise(0L)).as("n_bad_props"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))

  /** Sessionization: a session breaks after a >30-minute gap per user.
    * lag + cumulative-sum-of-flags, then per-user session stats.
    */
  /** Reference formulation of per-user sessionization: a window over
    * user_id. CORRECT but skew-exposed — the window sorts ALL of a
    * user's events in ONE task, so a power-law user at 100× data is a
    * hot task by construction. Kept as the equality target for
    * [[eventsSessionize]] (the registered, skew-hardened version) —
    * SkewSpec proves the two identical on a 100:1 skewed fixture.
    */
  def eventsSessionizeWindow(spark: SparkSession, dir: String): DataFrame = {
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

  /** Skew-hardened sessionization — the registered `events_sessionize`.
    *
    * The window formulation above puts every event of a user into one
    * task; a 100:1 heavy hitter makes that task the stage. This
    * version bounds per-task work by the (user, DAY) cell instead:
    *
    *   1. bucket events by day (width ≫ the 30-min gap), collect and
    *      sort each (user, day) cell's timestamps IN THE AGGREGATE
    *      (sort_array∘collect_list — one cell per row, never a
    *      per-user global sort), and count the cell's internal session
    *      starts with a HOF scan over adjacent gaps;
    *   2. stitch cells per user with a window over CELL SUMMARIES
    *      (rows per user = active days, not events — the hot user
    *      contributes ~366 summary rows, not 10⁹): the cell's first
    *      event is a continuation, not a session start, when it is
    *      within the gap of the previous cell's last event;
    *   3. a decomposable groupBy(user) sums (starts − continuations)
    *      and event counts — partial-aggregated map-side, so the hot
    *      key's shuffle volume is per-mapper cells, not raw events.
    *
    * Semantics are identical to the window version (same gap, ties at
    * equal ts irrelevant to gap tests); SkewSpec asserts equality on
    * skewed and uniform fixtures, and the sf oracle hashes it each
    * round. Memory: one day of ONE user's timestamps per aggregation
    * buffer — at 1 event/sec that is 86 400 longs ≈ 700 KB, safe; a
    * narrower bucket is the knob if a corpus ever beats that rate.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val bucketUs = 86400L * 1000000L
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("bucket", expr(s"us div ${bucketUs}L"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(sort_array(collect_list(col("us"))).as("tss"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("bucket"), col("n_events"),
        element_at(col("tss"), 1).as("first_us"),
        element_at(col("tss"), -1).as("last_us"),
        // session starts inside the cell, counting its first event
        (lit(1) + when(size(col("tss")) > 1,
          aggregate(
            transform(sequence(lit(1), size(col("tss")) - 1),
              i => (element_at(col("tss"), i + 1) -
                element_at(col("tss"), i) > gapUs).cast("int")),
            lit(0), (acc, x) => acc + x)).otherwise(lit(0))).as("starts"))
    val byUserBucket = Window.partitionBy(col("user_id"))
      .orderBy(col("bucket").asc)
    cells
      .withColumn("prev_last", lag(col("last_us"), 1).over(byUserBucket))
      .withColumn("cont",
        (col("prev_last").isNotNull &&
          col("first_us") - col("prev_last") <= gapUs).cast("int"))
      .groupBy(col("user_id"))
      .agg((sum(col("starts")) - sum(col("cont"))).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
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

  /** UNPIVOT (melt) — the inverse taxonomy cell of [[eventsPivot]],
    * expressed as the pivot's own output melted back through `stack`:
    * the roundtrip must equal the direct per-(day, type) aggregate,
    * which is exactly what the oracle states — a self-validating
    * identity (pivot ∘ unpivot = groupBy), not just syntax coverage.
    * Null cells (type absent that day) drop on the way back, matching
    * the direct aggregate's absent rows.
    */
  def eventsUnpivot(spark: SparkSession, dir: String): DataFrame =
    eventsPivot(spark, dir)
      .select(col("day"), expr(
        "stack(5, 'click', click, 'error', error, 'purchase', purchase, " +
          "'signup', signup, 'view', view) AS (event_type, sum_value)"))
      .filter(col("sum_value").isNotNull)
      .orderBy("day", "event_type")

  /** HOPPING (sliding) window aggregate — the overlap cell of the
    * window-TVF taxonomy beside [[eventsHourly]]'s tumbling case: 2-hour
    * windows advancing every hour, so each event lands in exactly two
    * windows (Spark's `window(ts, '2 hours', '1 hour')` TVF expands
    * rows before the hash aggregate — no self-union, no range join).
    * The oracle expands each event to its two covering window starts
    * explicitly (hour-truncated ts and one hour earlier), which IS the
    * TVF's expansion for this duration/slide pair. Money stays in
    * DECIMAL; first 48 windows keep the output calendar-bounded.
    */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")
      .limit(48)

  /** HyperLogLog distinct-count sketch per event type — the fixed-memory
    * (m=256 registers) cardinality estimator every large-scale pipeline
    * pairs with count-min (Flajolet et al. 2007, with the standard
    * linear-counting small-range correction). Deterministic and
    * oracle-replayable by construction: the register index is the first
    * md5 byte, the rank rho is the 1-based position of the first set bit
    * in the next 14 hex chars (capped at 32), and the register state is
    * a max — order- and partitioning-independent, so DuckDB reproduces
    * every register and the estimate arithmetic bit-for-bit (the only
    * float steps are one division and possibly one ln, both on
    * identical inputs; the output rounds to 3 decimals).
    *
    * Scale shape: ONE map-side-combined aggregation to ≤ types×256
    * register rows, then a types-sized rollup — the sketch state is
    * O(m) per group no matter how many events stream through, which is
    * the entire point at 100 TB. `exact_distinct` rides along (per-
    * register distincts are disjoint, so they sum) to expose the
    * estimation error; at true scale one would drop it and keep only
    * the sketch.
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame =
    hllOf(Tables.events(spark, dir))

  /** [[hllDistinct]] over an explicit events frame (spec entry point —
    * the sketch must be identical under any partitioning). */
  def hllOf(events: DataFrame): DataFrame = {
    val lzOf = (c: org.apache.spark.sql.Column) =>
      when(c === "1", 3).when(c.isin("2", "3"), 2)
        .when(c.isin("4", "5", "6", "7"), 1).otherwise(0)
    val regs = events
      .select(col("event_type"), col("event_id"),
        md5(concat(lit("hll|"), col("event_id").cast("string"))).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
      .withColumn("tail", substring(col("h"), 3, 14))
      .withColumn("zeros", length(regexp_extract(col("tail"), "^0*", 0)))
      .withColumn("firstc", expr("substring(tail, zeros + 1, 1)"))
      .withColumn("rho", least(
        when(col("firstc") === "", lit(4 * 14 + 1))
          .otherwise(col("zeros") * 4 + lzOf(col("firstc")) + 1),
        lit(32)))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("r"),
        countDistinct(col("event_id")).as("nd"))
    // alpha_256 · m² · 2³² / Σ 2^(32−r); empty registers contribute
    // 2³² each. All-integer sum (≤ 256·2³² < 2⁶³) keeps the register
    // state exact; the double arithmetic happens once per group.
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    regs.groupBy(col("event_type"))
      .agg(
        sum(col("nd")).as("exact_distinct"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - r)")).as("sum_present"),
        count(lit(1)).as("nonempty"))
      .withColumn("sum_scaled",
        col("sum_present") + (lit(256L) - col("nonempty")) * lit(4294967296L))
      .withColumn("raw",
        lit(alpha * 65536.0 * 4294967296.0) / col("sum_scaled"))
      .withColumn("hll_estimate", round(
        when(col("nonempty") < 256 && col("raw") < 640.0,
          lit(256.0) * log(lit(256.0) / (lit(256L) - col("nonempty"))))
          .otherwise(col("raw")), 3))
      .select(col("event_type"), col("exact_distinct"), col("hll_estimate"))
      .orderBy(col("event_type"))
  }

  /** JVM mirror of [[hllOf]]'s register derivation — (bucket 0..255,
    * rho 1..32) for one value. The streaming sketch and the batch query
    * must agree register-for-register, which StreamingSpec pins by
    * comparing their estimates exactly.
    */
  private[graft] def hllRegister(value: String): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(("hll|" + value).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(h.substring(0, 2), 16)
    val tail = h.substring(2, 16)
    val zeros = tail.takeWhile(_ == '0').length
    val rho =
      if (zeros == tail.length) 4 * 14 + 1
      else {
        val lz = tail.charAt(zeros) match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
        zeros * 4 + lz + 1
      }
    (bucket, math.min(rho, 32))
  }

  /** JVM mirror of [[hllOf]]'s estimate arithmetic over a 256-register
    * array (0 = empty) — same constants, same integer register sum,
    * same linear-counting branch, same HALF_UP round to 3 (via
    * `BigDecimal.valueOf`, the rounding Spark's `round` applies to
    * doubles).
    */
  private[graft] def hllEstimate(regs: Array[Byte]): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    var sumScaled = 0L
    var nonempty = 0
    var i = 0
    while (i < regs.length) {
      sumScaled += 1L << (32 - regs(i))
      if (regs(i) > 0) nonempty += 1
      i += 1
    }
    val raw = alpha * 65536.0 * 4294967296.0 / sumScaled
    val est =
      if (nonempty < 256 && raw < 640.0)
        256.0 * math.log(256.0 / (256 - nonempty))
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Cohort retention — the classic product-analytics matrix a query
    * engine over an events stream must express: each user's cohort is
    * their first ISO week, and cell (cohort, offset) counts the
    * distinct cohort members active `offset` weeks later. Both engines
    * truncate weeks to Monday, so day-difference ÷ 7 is an exact
    * integer; the output is (DATE, INT, BIGINT) — hash-exact.
    *
    * Scale shape: one (user, week) distinct, one per-user min, and one
    * co-partitioned equi-join on user_id — all three exchanges hash on
    * the user key, none on the raw event rows' count; at 100 TB the
    * cohort frame is users-sized and the join never broadcasts the
    * fact side. No window functions — the per-user min is a hash
    * aggregate, not a sort.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohorts = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    wk.join(cohorts, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort")) / 7).cast("int"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Funnel analysis — ordered step conversion, the other classic
    * product-analytics query beside [[eventsRetention]]: of the users
    * who signed up, how many later clicked, and of those, how many
    * later purchased (strictly increasing timestamps). Step k's frame
    * is `min ts of step-k events after the user's step-(k−1) time` — a
    * filter + hash aggregate + equi-join chain, never a per-user
    * ordered sequence scan: no window function, no sort, and each
    * join's right side is the shrinking survivor set of the previous
    * step (users-sized at worst, broadcastable in practice). Output
    * (step INT, event_type, n_users) — hash-exact.
    *
    * Every step emits its row UNCONDITIONALLY: each survivor set goes
    * through a global count (one row even over empty input), matching
    * the oracle's `SELECT k, 'type', count(*)` — a fixture vintage
    * missing a step type must read as n_users=0, not as a missing row
    * (a union-of-users-then-group formulation silently drops the row).
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stepRow(df: DataFrame, step: Int, typ: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(typ).as("event_type"),
          col("n_users"))
    stepRow(s1, 1, "signup")
      .unionAll(stepRow(s2, 2, "click"))
      .unionAll(stepRow(s3, 3, "purchase"))
      .orderBy(col("step"))
  }

  /** Funnel with a CONVERSION WINDOW — [[eventsFunnel]] with the
    * constraint every real funnel ships: step k counts only if it
    * happens within `windowDays` (7) of step k−1, not ever-after.
    * Same filter + hash-agg + shrinking-survivor-join chain, the only
    * change is the upper bound on each join's time predicate
    * (timestamp + INTERVAL arithmetic is exact integer microseconds on
    * both engines). Same unconditional step rows as the unwindowed
    * funnel; identical skew shape (SkewSpec's analysis carries over —
    * per-user min is a map-side partial aggregate).
    */
  def eventsFunnelWindowed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val win = expr("INTERVAL 7 DAYS")
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stepRow(df: DataFrame, step: Int, typ: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(typ).as("event_type"),
          col("n_users"))
    stepRow(s1, 1, "signup")
      .unionAll(stepRow(s2, 2, "click"))
      .unionAll(stepRow(s3, 3, "purchase"))
      .orderBy(col("step"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_funnel" -> (eventsFunnel _),
    "events_funnel_windowed" -> (eventsFunnelWindowed _),
    "events_retention" -> (eventsRetention _),
    "hll_distinct" -> (hllDistinct _),
    "events_pivot" -> (eventsPivot _),
    "events_sliding" -> (eventsSliding _),
    "events_unpivot" -> (eventsUnpivot _),
    "events_hourly" -> (eventsHourly _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_ewma" -> (eventsEwma _),
    "events_top_users" -> (eventsTopUsers _),
    "events_seasonal_anomaly" -> (eventsSeasonalAnomaly _),
    "events_json" -> (eventsJson _),
    "events_profile" -> (eventsProfile _),
    "events_sessionize" -> (eventsSessionize _),
    "events_asof" -> (eventsAsof _),
    "events_range_join" -> (eventsRangeJoin _),
    "events_cdc_latest" -> (eventsCdcLatest _),
  )

  def oracles: Map[String, String] = Map(
    "events_cdc_latest" ->
      """SELECT user_id, event_type, ts AS last_ts,
        |  event_id AS last_event_id, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    // HLL replay: identical md5-derived register index + rank, integer
    // register state, and the same literal-by-literal estimate
    // arithmetic (one double division, one ln in the linear-counting
    // branch, round to 3).
    "hll_distinct" -> {
      val raw = "(0.7213 / (1.0 + 1.079/256.0)) * 65536.0 * 4294967296.0" +
        " / (sum_present + (256 - nonempty) * 4294967296)"
      s"""WITH rr AS (
         |  SELECT event_type, event_id,
         |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
         |    (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
         |    substr(h, 3, 14) AS tail
         |  FROM (SELECT event_type, event_id,
         |          md5('hll|' || CAST(event_id AS VARCHAR)) AS h
         |        FROM events)),
         |rho AS (
         |  SELECT event_type, event_id, bucket,
         |    least(CASE WHEN firstc = '' THEN 57
         |          ELSE zeros * 4 +
         |               CASE WHEN firstc = '1' THEN 3
         |                    WHEN firstc IN ('2','3') THEN 2
         |                    WHEN firstc IN ('4','5','6','7') THEN 1
         |                    ELSE 0 END + 1 END, 32) AS rho
         |  FROM (SELECT event_type, event_id, bucket, zeros,
         |          substr(tail, CAST(zeros + 1 AS INTEGER), 1) AS firstc
         |        FROM (SELECT *, length(regexp_extract(tail, '^0*')) AS zeros
         |              FROM rr))),
         |regs AS (
         |  SELECT event_type, bucket, max(rho) AS r,
         |         count(DISTINCT event_id) AS nd
         |  FROM rho GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type,
         |    CAST(sum(nd) AS BIGINT) AS exact_distinct,
         |    CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT) AS sum_present,
         |    count(*) AS nonempty
         |  FROM regs GROUP BY 1)
         |SELECT event_type, exact_distinct,
         |  round(CASE WHEN nonempty < 256 AND $raw < 640.0
         |        THEN 256.0 * ln(256.0 / (256 - nonempty))
         |        ELSE $raw END, 3) AS hll_estimate
         |FROM agg ORDER BY event_type""".stripMargin
    },
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
    "events_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |  GROUP BY 1)
        |SELECT step, event_type, n_users FROM (
        |  SELECT 1 AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "events_funnel_windowed" ->
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |    AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 7 DAY
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |    AND CAST(e.ts AS TIMESTAMP) <= s2.t2 + INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT step, event_type, n_users FROM (
        |  SELECT 1 AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "events_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |  FROM events),
        |coh AS (
        |  SELECT user_id, min(week) AS cohort FROM wk GROUP BY 1)
        |SELECT c.cohort,
        |  CAST(date_diff('day', c.cohort, w.week) / 7 AS INTEGER) AS week_offset,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM wk w JOIN coh c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "events_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, quantile_cont(n, 0.5) AS med_daily
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.n, m.med_daily,
        |       d.n > 2.0 * m.med_daily AS is_anomaly
        |FROM daily d JOIN med m USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    "events_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d2 AS (
        |  SELECT event_type, day, n, CAST(isodow(day) AS INTEGER) AS dow
        |  FROM daily),
        |prof AS (
        |  SELECT event_type, dow, sum(n) AS d_sum, count(*) AS d_cnt
        |  FROM d2 GROUP BY 1, 2)
        |SELECT d.event_type, d.day, d.dow, d.n,
        |       d.n * p.d_cnt > 2 * p.d_sum AS is_anomaly
        |FROM d2 d JOIN prof p ON d.event_type = p.event_type AND d.dow = p.dow
        |ORDER BY d.event_type, d.day""".stripMargin,
    "events_unpivot" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,
    "events_sliding" ->
      """WITH ex AS (
        |  SELECT event_type, value,
        |         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
        |  FROM events),
        |w AS (
        |  SELECT event_type, value, h AS w_start FROM ex
        |  UNION ALL
        |  SELECT event_type, value, h - INTERVAL 1 HOUR FROM ex)
        |SELECT w_start, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2
        |ORDER BY w_start, event_type
        |LIMIT 48""".stripMargin,
    "events_top_users" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(rn AS INTEGER) AS rank, user_id, n FROM (
        |  SELECT event_type, user_id, n,
        |    row_number() OVER (PARTITION BY event_type
        |                  ORDER BY n DESC, user_id ASC) AS rn
        |  FROM pu)
        |WHERE rn <= 3
        |ORDER BY event_type, rank""".stripMargin,
    "events_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type, list(n ORDER BY day) AS l
        |  FROM daily GROUP BY 1)
        |SELECT event_type,
        |       CAST(len(l) AS INTEGER) AS n_days,
        |       l[-1] AS last_n,
        |       round(list_reduce(list_transform(l, x -> CAST(x AS DOUBLE)),
        |                         (a, b) -> a * 0.75 + b * 0.25), 4) AS ewma
        |FROM ser ORDER BY event_type""".stripMargin,
    "events_profile" ->
      """SELECT count(*) AS n_events,
        |  count(DISTINCT event_id) AS n_event_ids,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_ts,
        |  min(ts) AS min_ts,
        |  max(ts) AS max_ts,
        |  CAST(sum(CASE WHEN props IS NULL THEN 1
        |                WHEN NOT json_valid(props) THEN 1
        |                WHEN props->>'k' IS NULL THEN 1
        |                ELSE 0 END) AS BIGINT)
        |    AS n_bad_props,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events""".stripMargin,
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
