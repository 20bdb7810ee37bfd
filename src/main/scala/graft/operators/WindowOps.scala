package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Common.dsum

/** Event-time windowed aggregation family (W2-W4) over the harness
  * `events` table.
  *
  * The reference batches by COUNT-or-timeout on processing time
  * (`/root/reference/src/main/java/com/thaihoc/process/response/InvoiceResponseBatchProcessor.java:26-316`,
  * covered by G2/MicroBatcher); it has no event-time windows. A
  * Spark-native engine gets them for free — `window()` /
  * `session_window()` group keys work identically in batch and in
  * Structured Streaming with a watermark (the streaming binding is
  * exercised in WindowedStreamingSpec; these batch forms are the
  * oracle-checked restatements).
  *
  * Scale notes: a tumbling/sliding window agg is ONE hash shuffle on
  * (window, keys) with map-side partial aggregation — the window struct
  * is computed per-row before the exchange, so no extra pass. The
  * sliding form fans each row into len/slide windows BEFORE the partial
  * agg (here 2×; the multiplier, not the row count, is the scale knob).
  * Session windows shuffle on user_id and merge per-key sorted runs —
  * Spark's batch physical plan sorts within partitions; skewed users
  * (bot traffic) are the AQE-skew / salting case, same playbook as g2b.
  */
object WindowOps {

  /** W2 — tumbling 1-hour window × event_type: count + exact-decimal
    * value sum. Epoch-aligned windows = hour truncation on both engines. */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    ScanOps.eventsTs(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .transform(Common.presented(_, col("win_start"), col("event_type")))

  /** W3 — sliding 1-hour window every 30 minutes: each event lands in
    * exactly len/slide = 2 windows. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    ScanOps.eventsTs(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("n_events"), col("sum_value"))
      .transform(Common.presented(_, col("win_start")))

  /** W4 — per-user session windows with a 30-minute inactivity gap.
    * Spark session semantics: an event extends the session iff its ts is
    * STRICTLY inside [prev_ts, prev_ts + gap); session end = last event
    * + gap. The oracle restates this as the classic gaps-and-islands
    * (lag → break flag → running sum → group). */
  def session(s: SparkSession, dir: String): DataFrame =
    ScanOps.eventsTs(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"), col("sum_value"))
      .transform(Common.presented(_, col("user_id"), col("sess_start")))

  /** W5 — gap filling / resampling: a dense hourly spine per user
    * (`sequence` between that user's first and last event hour),
    * left-joined with the actual hourly aggregates; empty hours get a
    * zero count and the value carries forward (LOCF via
    * `last(_, ignoreNulls)` over the hour order). The standard
    * time-series densification: the spine generates ~rows-per-key ×
    * buckets rows BEFORE a single left join — at 100 TB bound the
    * spine range per key (as here: each user's own min/max, not the
    * global range) or the fill explodes on long-lived keys. Restricted
    * to a user cohort to keep the compared output proportionate. */
  def gapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = ScanOps.eventsTs(s, dir).filter(col("user_id") % 10 === 0)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val hourly = ev.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sumv"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("cnt"), lit(0L)).as("n_events"),
        last(col("sumv"), ignoreNulls = true).over(w).as("locf_value"))
      .transform(Common.presented(_, col("user_id"), col("hour")))
  }

  /** W6 — funnel analysis: per user, the first `view`, the first `click`
    * strictly after that view, and the first `purchase` strictly after
    * that click — the classic ordered-conversion funnel (the
    * MATCH_RECOGNIZE shape, restated as three chained conditional
    * window-mins so it needs no pattern engine). All three windows
    * partition on user_id with a whole-partition frame and no ordering,
    * so the physical plan is ONE exchange on user_id feeding three
    * Window nodes and the final per-user aggregate — the groupBy reuses
    * the same hash partitioning, no second shuffle. At 100 TB the fan-in
    * is per-user event counts (bounded by retention), and a skewed
    * power-user key is the same AQE-skew/salting case as w4. Conditional
    * min ignores nulls on both engines, and `ts > v` with v NULL is
    * NULL → excluded, so stage k is reachable only through stage k-1. */
  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelCore(ScanOps.eventsTs(s, dir))

  /** Funnel core over any (user_id, event_type, ts) frame — split out so
    * the ordering rule (stage k reachable only through stage k-1) is unit-testable on
    * crafted rows. */
  def funnelCore(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("v",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts") > col("v"),
          col("ts"))).over(byUser))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts") > col("c"),
          col("ts"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(min(col("v")).as("first_view"),
        min(col("c")).as("first_click"),
        min(col("p")).as("first_purchase"))
      .withColumn("funnel_stage",
        when(col("first_purchase").isNotNull, 3)
          .when(col("first_click").isNotNull, 2)
          .when(col("first_view").isNotNull, 1)
          .otherwise(0))
      .transform(Common.presented(_, col("user_id")))
  }

  /** W7 — weekly cohort retention: users are cohorted by the week of
    * their first event; each cell is how many of that cohort were
    * active `week_offset` weeks later — the standard retention
    * triangle. Three exchanges, each over a SHRINKING set: the
    * activity distinct collapses events to user-weeks (bounded by
    * users × weeks, not event count), the cohort week is a window min
    * on user_id over that collapsed set, and the final cell aggregate
    * groups the same rows by (cohort_week, offset). countDistinct in
    * the cell agg is exact-safe here because each (user, week) row is
    * already unique — Spark plans it as a re-keyed aggregate, not an
    * Expand. Week truncation is ISO-Monday on both engines; the
    * offset divides an exact day difference by 7, all integer math. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = ScanOps.eventsTs(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    act
      .withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .transform(Common.presented(_, col("cohort_week"), col("week_offset")))
  }

  /** W10 — multi-touch ATTRIBUTION: every purchase distributes credit
    * over the user's clicks in the preceding 2 hours — linear weight
    * 1/n plus a last-touch flag, the two standard marketing/conversion
    * models in one pass. The click↔purchase pairing reuses JX6's
    * bucketed range-join shape (explode each purchase's 2-hour
    * look-back into fixed-width buckets, equi-join clicks on
    * (user, bucket), filter exact containment — no
    * BroadcastNestedLoopJoin, pair space bounded by bucket occupancy);
    * the per-purchase weights are then one window over p_event_id,
    * which AQE plans on the join's output without re-reading either
    * side. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = ScanOps.eventsTs(s, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"),
        expr(s"unix_micros(ts) div $AttrBucketMicros").as("bkt"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withColumn("bkt", explode(sequence(
        expr(s"unix_micros(p_ts - INTERVAL 2 HOURS) div $AttrBucketMicros"),
        expr(s"unix_micros(p_ts) div $AttrBucketMicros"))))
    val byPurchase = Window.partitionBy(col("p_event_id"))
    val lastTouch = Window.partitionBy(col("p_event_id"))
      .orderBy(col("c_ts").desc, col("c_event_id").desc)
    val linearW = lit(1.0) / count(lit(1)).over(byPurchase)
    p.join(c, col("user_id") === col("c_user") && p("bkt") === c("bkt") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 2 HOURS"))
      .select(col("p_event_id"), col("user_id"), col("p_ts"),
        col("c_event_id"), col("c_ts"), col("p_value"))
      .withColumn("n_touch", count(lit(1)).over(byPurchase))
      .withColumn("linear_w", linearW)
      .withColumn("last_touch",
        when(row_number().over(lastTouch) === 1, 1).otherwise(0))
      .withColumn("attributed_value", col("p_value") * linearW)
      .drop("p_value")
      .transform(Common.presented(_, col("p_event_id"), col("c_event_id")))
  }

  /** W10's look-back width and its covering-bucket width (equal, so a
    * window spans ≤ 2 buckets — the JX6 construction). */
  val AttrBucketMicros = 7200000000L // 2 hours

  /** w11's result size — the classic "top paths" dashboard cut. */
  val PathTopK = 10

  /** W11 — sequential PATH MINING: the top-[[PathTopK]] event-type
    * TRIGRAM paths across every user's chronological stream — the
    * discovery twin of w6's funnel (the funnel VERIFIES one declared
    * sequence; path mining SURFACES which sequences actually happen,
    * the query that tells you which funnels to build). Each event
    * pairs with its two successors via `lead` over the (user, time)
    * order — per-row window columns, no self-join, no explode — and
    * trailing 1-/2-step tails drop (a path must complete inside the
    * user's stream). Counts are integers and ties break
    * lexicographically on the path, so the cut is deterministic.
    *
    * 100 TB plan: ONE exchange on user_id feeds both lead windows
    * (shared sort), and the trigram aggregate collapses map-side to at
    * most |event types|³ rows per partition before its exchange —
    * the gram space, never the event volume. Top-k is
    * TakeOrderedAndProject. A skewed power user is w4's AQE-skew/salt
    * case; longer grams add lead columns, not plan shape. */
  def pathNgrams(s: SparkSession, dir: String): DataFrame =
    pathNgramsCore(ScanOps.eventsTs(s, dir))

  /** w11 over any (user_id, event_id, ts, event_type) frame — split out
    * so the ordering/tail rules are unit-testable on crafted rows. */
  def pathNgramsCore(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ord = Seq(col("n_paths").desc,
      col("step1"), col("step2"), col("step3"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("event_type").as("step1"),
        col("s2").as("step2"), col("s3").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(ord: _*).limit(PathTopK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(ord: _*)))
      .select(col("rank"), col("step1"), col("step2"), col("step3"),
        col("n_paths"))
      .transform(Common.presented(_, col("rank")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w11_path_ngrams" -> (pathNgrams _),
    "w10_attribution" -> (attribution _),
    "w2_tumbling" -> (tumbling _),
    "w3_sliding" -> (sliding _),
    "w4_session" -> (session _),
    "w5_gapfill" -> (gapfill _),
    "w6_funnel" -> (funnel _),
    "w7_retention" -> (retention _),
    "w8_anomaly" -> (anomaly _),
    "w9_streaks" -> (streaks _))

  /** W8's outlier rule: |x − μ| · [[AnomalyDenom]] > [[AnomalyNum]] · σ,
    * i.e. a 2.5-sigma cut stated in integer-scaled form. */
  val AnomalyNum = 25L
  val AnomalyDenom = 10L

  /** W8 — per-group anomaly detection: flag events whose value sits
    * beyond 2.5σ of their event_type's distribution — the monitoring
    * query every pipeline runs over its metric streams. Moments come
    * from ONE pass of exact scaled-long sums (Σx, Σx² via the
    * decimal(18,4)-equivalent contract, partition-order-independent),
    * broadcast back to the narrow scan — two scans, one tiny exchange,
    * no window over the full data. The σ comparison is squared on both
    * sides (|x−μ|² vs z²·σ²) so no sqrt enters the flag — all double
    * arithmetic on identical operands, no rounding divergence. At
    * 100 TB the stats side collapses to |event_type| rows map-side and
    * the flag pass is scan-bound. */
  def anomaly(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Common.dsum
    val ev = ScanOps.eventsTs(s, dir).select(col("event_id"),
      col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type")).agg(
      dsum(col("value")).as("sum_v"),
      dsum(col("value") * col("value")).as("sum_v2"),
      count(lit(1)).as("n"))
    // μ = Σx/n, σ² = Σx²/n − μ² — identical double expression trees on
    // both engines over exact decimal-derived operands
    val mu = col("sum_v") / col("n")
    val varE = col("sum_v2") / col("n") - mu * mu
    val dev = col("value") - mu
    val isOut = (dev * dev) * (AnomalyDenom * AnomalyDenom) >
      varE * (AnomalyNum * AnomalyNum)
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        mu.as("mean_v"),
        when(isOut, 1).otherwise(0).as("is_anomaly"))
      .filter(col("is_anomaly") === 1)
      .transform(Common.presented(_, col("event_id")))
  }

  /** Nanoseconds / microseconds per UTC day — W9's integer day grid.
    * Day indices come from integer division of the epoch offset on
    * BOTH engines (the oracle divides epoch_ns by DayNanos, the Spark
    * side divides ScanOps.tsMicros by DayMicros — the same index for
    * any post-1970 instant), so no timezone/truncation semantics can
    * diverge. */
  val DayNanos = 86400L * 1000 * 1000 * 1000
  val DayMicros = 86400L * 1000 * 1000

  /** W9 — activity streaks (gaps-and-islands): per user, the longest
    * run of CONSECUTIVE active days, total active days, and number of
    * distinct runs — the engagement metric over any event log.
    * Classic island key: within a user's ordered distinct days,
    * `day − row_number()` is constant exactly along a consecutive run.
    *
    * Scale shape: one distinct over (user_id, day) — map-side partial —
    * then every window/group stage keys on user_id, so AFTER the one
    * exchange the island window, island agg and per-user rollup are all
    * partition-local (Catalyst reuses the hash partitioning; no second
    * shuffle). Days as integers (epoch micros div 86400e6), never
    * calendar types. */
  def streaks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // repartition on user_id ALONE before the distinct: hash(user_id)
    // satisfies ClusteredDistribution(user_id, day) (subset rule), so
    // the dedup, the island window and both rollups all reuse this ONE
    // exchange — a plain .distinct() would hash on (user_id, day) and
    // force a second exchange for the window (PlanContractSpec pins it)
    val ev = graft.sources.Tables.events(s, dir)
    val days = ev
      .select(col("user_id"),
        expr(s"(${ScanOps.tsMicrosSql(ev)}) div $DayMicros").as("day"))
      .repartition(col("user_id"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("run_len"))
    islands.groupBy(col("user_id"))
      .agg(
        sum(col("run_len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("run_len")).as("longest_streak"))
      .transform(Common.presented(_, col("user_id")))
  }

  val oracles: Map[String, String] = Map(
    // w11: identical lead windows over the identical (ts, event_id)
    // order; counts integer, ties path-lexicographic
    "w11_path_ngrams" ->
      s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |                   event_type
         |            FROM events),
         |g AS (SELECT event_type AS step1,
         |             lead(event_type, 1) OVER (PARTITION BY user_id
         |               ORDER BY ts, event_id) AS step2,
         |             lead(event_type, 2) OVER (PARTITION BY user_id
         |               ORDER BY ts, event_id) AS step3
         |      FROM ev),
         |c AS (SELECT step1, step2, step3, count(*) AS n_paths FROM g
         |      WHERE step2 IS NOT NULL AND step3 IS NOT NULL
         |      GROUP BY 1, 2, 3),
         |top AS (SELECT * FROM c
         |        ORDER BY n_paths DESC, step1, step2, step3 LIMIT $PathTopK)
         |SELECT CAST(row_number() OVER (ORDER BY n_paths DESC, step1, step2,
         |              step3) AS INT) AS rank,
         |       step1, step2, step3, n_paths
         |FROM top ORDER BY rank""".stripMargin,
    // the raw inequality join is the oracle's privilege (DuckDB plans
    // it fine at oracle scale); the Spark side uses the bucketed
    // equi-join restatement — identical pairs by construction
    "w10_attribution" ->
      """WITH c AS (SELECT event_id AS c_event_id, user_id,
        |                  CAST(ts AS TIMESTAMP) AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_event_id, user_id,
        |             CAST(ts AS TIMESTAMP) AS p_ts, value AS p_value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p_event_id, p.user_id AS user_id, p_ts, p_value,
        |             c_event_id, c_ts
        |      FROM p JOIN c ON p.user_id = c.user_id
        |        AND c.c_ts <= p.p_ts
        |        AND c.c_ts > p.p_ts - INTERVAL 2 HOUR)
        |SELECT p_event_id, user_id, p_ts, c_event_id, c_ts,
        |       count(*) OVER w AS n_touch,
        |       CAST(1 AS DOUBLE) / count(*) OVER w AS linear_w,
        |       CASE WHEN row_number() OVER (PARTITION BY p_event_id
        |                    ORDER BY c_ts DESC, c_event_id DESC) = 1
        |            THEN 1 ELSE 0 END AS last_touch,
        |       p_value * (CAST(1 AS DOUBLE) / count(*) OVER w) AS attributed_value
        |FROM j WINDOW w AS (PARTITION BY p_event_id)
        |ORDER BY p_event_id, c_event_id""".stripMargin,
    "w9_streaks" ->
      s"""WITH days AS (SELECT DISTINCT user_id,
        |                     epoch_ns(ts) // $DayNanos AS day
        |              FROM events),
        |isl AS (SELECT user_id,
        |               day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |        FROM days),
        |runs AS (SELECT user_id, island, count(*) AS run_len
        |         FROM isl GROUP BY user_id, island)
        |SELECT user_id,
        |       CAST(sum(run_len) AS BIGINT) AS n_active_days,
        |       count(*) AS n_islands,
        |       CAST(max(run_len) AS BIGINT) AS longest_streak
        |FROM runs GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "w2_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
        |       date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS win_end,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY win_start, event_type""".stripMargin,
    "w3_sliding" ->
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |fan AS (SELECT ts, value,
        |               time_bucket(INTERVAL '30 minutes', ts)
        |                 - INTERVAL '30 minutes' * s.j AS win_start
        |        FROM ev, unnest([0, 1]) AS s(j))
        |SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM fan
        |GROUP BY win_start
        |ORDER BY win_start""".stripMargin,
    "w4_session" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |marks AS (SELECT *,
        |                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                             >= INTERVAL '30 minutes'
        |                      THEN 1 ELSE 0 END AS brk
        |          FROM ev),
        |grp AS (SELECT *,
        |               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                              ROWS UNBOUNDED PRECEDING) AS sess
        |        FROM marks)
        |SELECT user_id,
        |       min(ts) AS sess_start,
        |       max(ts) + INTERVAL '30 minutes' AS sess_end,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM grp
        |GROUP BY user_id, sess
        |ORDER BY user_id, sess_start""".stripMargin,
    "w5_gapfill" ->
      """WITH ev AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value
        |            FROM events WHERE user_id % 10 = 0),
        |hourly AS (SELECT user_id, hour, count(*) AS cnt,
        |                  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sumv
        |           FROM ev GROUP BY user_id, hour),
        |bounds AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |           FROM ev GROUP BY user_id),
        |spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |          FROM bounds)
        |SELECT s.user_id, s.hour,
        |       coalesce(h.cnt, 0) AS n_events,
        |       last_value(h.sumv IGNORE NULLS) OVER (
        |         PARTITION BY s.user_id ORDER BY s.hour
        |         ROWS UNBOUNDED PRECEDING) AS locf_value
        |FROM spine s LEFT JOIN hourly h
        |  ON s.user_id = h.user_id AND s.hour = h.hour
        |ORDER BY s.user_id, s.hour""".stripMargin,
    "w6_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |            FROM events),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |                   OVER (PARTITION BY user_id) AS v FROM ev),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > v THEN ts END)
        |                   OVER (PARTITION BY user_id) AS c FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END)
        |                   OVER (PARTITION BY user_id) AS p FROM s2)
        |SELECT user_id,
        |       min(v) AS first_view,
        |       min(c) AS first_click,
        |       min(p) AS first_purchase,
        |       CASE WHEN min(p) IS NOT NULL THEN 3
        |            WHEN min(c) IS NOT NULL THEN 2
        |            WHEN min(v) IS NOT NULL THEN 1
        |            ELSE 0 END AS funnel_stage
        |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w7_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |                    CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
        |                      AS TIMESTAMP) AS week
        |             FROM events),
        |w AS (SELECT user_id, week,
        |             min(week) OVER (PARTITION BY user_id) AS cohort_week
        |      FROM act)
        |SELECT cohort_week,
        |       CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
        |       count(DISTINCT user_id) AS n_active
        |FROM w
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // dsum contract for both moments; the sigma comparison is squared
    // (|x-mu|^2 · denom^2 > var · num^2) so no sqrt enters the flag; the
    // squared constants are interpolated from the same AnomalyNum/Denom the
    // Spark side uses, so editing the threshold keeps both engines in sync
    "w8_anomaly" ->
      s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
        |stats AS (SELECT event_type,
        |                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
        |                 CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v2,
        |                 count(*) AS n
        |          FROM ev GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |       sum_v / n AS mean_v,
        |       CAST(1 AS INT) AS is_anomaly
        |FROM ev e JOIN stats s ON e.event_type = s.event_type
        |WHERE ((value - sum_v / n) * (value - sum_v / n)) * ${AnomalyDenom * AnomalyDenom}
        |      > (sum_v2 / n - (sum_v / n) * (sum_v / n)) * ${AnomalyNum * AnomalyNum}
        |ORDER BY event_id""".stripMargin)
}
