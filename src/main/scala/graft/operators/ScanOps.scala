package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Incremental scans, bootstraps and unions (reference §2.1 S2-S5, §2.4
  * U1/U2).
  *
  * The reference polls MySQL with pushed-down predicates
  * (`/root/reference/src/main/java/com/thaihoc/source/AsyncInvInSource.java:55`:
  * `WHERE res_type = 2 AND state = 4 AND id > ? ORDER BY id ASC LIMIT n`).
  * Here the same scan shapes run over the harness `events` table; the
  * watermark `id > ?` is a parameter in streaming mode and a fixed literal
  * in the oracle-checked batch form. Every predicate is a plain column
  * comparison so Catalyst pushes it into the parquet scan (PushedFilters)
  * and the `orderBy(...).limit(n)` plans as `TakeOrderedAndProject` — no
  * global sort, no full-table materialization. At 100 TB these scans read
  * only the matching row groups (min/max pruning on `event_id`) and ship
  * `n` rows per executor to the driver-side top-n merge.
  */
object ScanOps {

  /** Harness events with wall-clock `ts`, whatever physical type the
    * parquet carries. The reference is schema-tolerant at ingestion
    * (`process/request/InvoiceRequestTransformer.java:57-89` probes
    * alternative field locations at runtime); this is the scan-layer
    * equivalent — dispatch on the ARRIVED dtype in one place so a
    * harness regen (TIMESTAMP(NANOS) → timestamp[us] or back) changes
    * nothing downstream:
    *   - TimestampType (µs instant): already wall-clock, pass through
    *     (Tables.table turns NTZ inference off, so naive-µs parquet
    *     arrives here — stored micros read as the epoch instant);
    *   - TimestampNTZType (defensive — only if a caller re-enables
    *     inference): cast to instant; sessions pin UTC so the mapping
    *     is identity on the stored micros;
    *   - LongType (raw nanos via `nanosAsLong`): integral `div 1000`
    *     → micros (a double division would lose precision above
    *     2^53 ns), then `timestamp_micros`. */
  def eventsTs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => ev
      case org.apache.spark.sql.types.TimestampNTZType =>
        ev.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — extend the " +
          "ScanOps.eventsTs dtype dispatch (EventsSchemaSpec pins the " +
          "supported set)")
    }
  }

  /** Micros-since-epoch as a Column, for integer time arithmetic (day
    * grids, range buckets) over a frame whose `ts` may be either
    * physical type. Twin of [[eventsTs]] — same dispatch, integral
    * output. */
  def tsMicros(df: DataFrame, c: String = "ts"): org.apache.spark.sql.Column =
    expr(tsMicrosSql(df, c))

  /** SQL-text twin of [[tsMicros]], for composing into larger `expr`
    * strings (e.g. `(…) div DayMicros` — the integral `div` operator
    * has no Column-API form, and a double division truncated back to
    * long is one ulp away from a wrong bucket at a boundary). */
  def tsMicrosSql(df: DataFrame, c: String = "ts"): String =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => s"unix_micros($c)"
      case org.apache.spark.sql.types.TimestampNTZType =>
        s"unix_micros(cast($c as timestamp))"
      case org.apache.spark.sql.types.LongType => s"$c div 1000"
      case other => throw new IllegalStateException(
        s"$c arrived as unsupported type $other for integer time arithmetic")
    }

  /** S2 — incremental scan of `async_inv_in`
    * (`AsyncInvInSource.java:55`): two equality predicates + id
    * high-watermark, ordered, limited. */
  def scanIn(s: SparkSession, dir: String): DataFrame =
    eventsTs(s, dir)
      .filter(col("event_type") === "click" && col("user_id") % 4 === 0 &&
        col("event_id") > 3000)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), col("ts"))
      .orderBy(col("event_id"))
      .limit(2000)

  /** S3 — twin scan of `async_inv_out` (`AsyncInvOutSource.java:55`,
    * predicate `res_type = 2 AND state = 0`). */
  def scanOut(s: SparkSession, dir: String): DataFrame =
    eventsTs(s, dir)
      .filter(col("event_type") === "view" && col("user_id") % 4 === 1 &&
        col("event_id") > 1000)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), col("ts"))
      .orderBy(col("event_id"))
      .limit(2000)

  /** S4 — retry-queue poll + claim
    * (`InvoiceRetrySource.java:48`: `state='PENDING' AND next_retry_time
    * <= CURRENT_TIMESTAMP AND job = ? ORDER BY next_retry_time LIMIT ?`).
    * The claim UPDATE is a sink-side transaction; the scan projects the
    * post-claim state (`:76-88`). `event_id` tiebreaks the order for
    * determinism (the reference relies on MySQL's arbitrary tie order). */
  def retryClaim(s: SparkSession, dir: String): DataFrame =
    eventsTs(s, dir)
      .filter(col("event_type") === "error" && col("user_id") % 5 === 2 &&
        col("ts") <= to_timestamp(lit("2024-01-15 00:00:00")))
      .select(col("event_id"), col("user_id"), col("ts").as("next_retry_time"),
        lit("PROCESSING").as("claimed_state"))
      .orderBy(col("next_retry_time"), col("event_id"))
      .limit(100)

  /** S5/G5 — max-id bootstrap (`AsyncInvInSource.java:39-49`):
    * `COALESCE(MAX(id), 0)` under the scan predicate. */
  def maxId(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("user_id") % 4 === 2)
      .agg(coalesce(max(col("event_id")), lit(0L)).as("max_id"))

  /** U1 — 6-way union (`job/InvoiceRequest.java:80-85`): five Kafka
    * topics + the retry stream, merged via `unionByName` with
    * missing-column fill (the retry branch carries `retry_count`; the
    * topic branches don't — Spark supersedes the reference's
    * type-erase-to-Object trick, T1). */
  def union6(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val topics = Seq("click", "view", "error", "purchase", "signup").map { t =>
      ev.filter(col("event_type") === t)
        .select(col("event_id"), concat(lit("topic_"), lit(t)).as("source_topic"))
    }
    val retry = ev.filter(col("event_type") === "error" && col("user_id") % 5 === 2)
      .select(col("event_id"), lit("retry_queue").as("source_topic"),
        (col("event_id") % 5).cast("tinyint").as("retry_count"))
    topics.reduce(_ unionByName _)
      .unionByName(retry, allowMissingColumns = true)
      .transform(Common.presented(_, col("source_topic"), col("event_id")))
  }

  /** U2 — side-output union (`job/InvoiceRequest.java:96-98`): the three
    * retry tags from T5 are split into per-tag branches (each bound for a
    * different DML in sink K2) and re-merged before the single retry
    * sink. The filter-split + union round trip is the point of the
    * operator — the oracle states the equivalent single-pass CASE. */
  def sideUnion(s: SparkSession, dir: String): DataFrame = {
    val t5 = RequestOps.retryBackoffCore(s, dir)
    def branch(tag: String, sinkTable: String) =
      t5.filter(col("tag") === tag)
        .select(col("event_id"), col("tag"), lit(sinkTable).as("sink_table"))
    branch("UPDATE", "invoice_retry")
      .unionByName(branch("DELETE", "invoice_retry"))
      .unionByName(branch("MAX_RETRY", "invoice_error_log"))
      .transform(Common.presented(_, col("event_id")))
  }

  /** S6 — point-in-time snapshot: each user's LATEST event at a cutoff
    * timestamp — the state-reconstruction read every CDC/warehouse
    * pipeline runs (the reference's MySQL tables hold exactly this
    * "current state"; a log-structured lake recomputes it from the
    * event stream). One exchange on user_id; the row_number-over-desc
    * gets WindowGroupLimit's map-side top-1 pruning, so each partition
    * ships at most one row per user it saw — at 100 TB this is the
    * latest-record compaction shape, and writing the input bucketed by
    * user_id would make it exchange-free. The cutoff filter is pushed
    * to the parquet scan as a plain ts predicate. */
  def latestSnapshot(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    eventsTs(s, dir)
      .filter(col("ts") <= to_timestamp(lit("2024-01-20 00:00:00")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("ts").as("last_ts"))
      .transform(Common.presented(_, col("user_id")))
  }

  /** S8 — SNAPSHOT DIFF / change-data-feed: the I/U/D changelog between
    * two point-in-time states of the keyed table — what a lakehouse
    * MERGE consumes and what Delta/Iceberg expose as a change feed,
    * recomputed here from the raw event log. State-at-cutoff reuses
    * S6's latest-per-key rule, with `error` events playing the DELETE
    * tombstone (a key whose latest event is an error is absent from
    * that snapshot). The diff is one full-outer self-merge on user_id:
    * absent→present = I, present→absent = D, both-present-but-changed
    * = U; unchanged keys drop (that's what makes the feed incremental —
    * at 100 TB its size tracks the CHANGED keys between cutoffs, not
    * the table). Both snapshot windows and the join share the user_id
    * hash partitioning; input bucketed by user_id → exchange-free. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame =
    snapshotDiffAgainst(stateAtCutoff(s, dir, DiffCutoff1),
        stateAtCutoff(s, dir, DiffCutoff2))
      .transform(Common.presented(_, col("user_id")))

  /** s8/s11's shared snapshot cutoffs — ONE pair of instants so the
    * feed producer and its apply consumer can't desynchronize. */
  val DiffCutoff1 = "2024-01-10 00:00:00"
  val DiffCutoff2 = "2024-01-20 00:00:00"

  /** The visible keyed snapshot as of `cutoff` — s6's latest-per-key
    * rule with tombstones dropped at read (s8/s11's state source). */
  def stateAtCutoff(s: SparkSession, dir: String, cutoff: String): DataFrame =
    visibleState(stateOf(eventsTs(s, dir)
      .filter(col("ts") <= to_timestamp(lit(cutoff)))))

  /** The latest-per-key compacted STATE of a change log, tombstones
    * INCLUDED: one row per user carrying its latest (event_type →
    * state, value, ts, event_id). `error` rows stay as explicit
    * tombstones so the compaction is ASSOCIATIVE — `stateOf(stateOf(a)
    * ∪ b) == stateOf(a ∪ b)` even when a tombstoned key receives a
    * LATE out-of-order event (dropping tombstones would wrongly
    * resurrect it); [[visibleState]] applies the drop at read time.
    * This is the state-transition core both the batch s8 feed and the
    * streaming monitor (StreamingCdfSpec) run. */
  def stateOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("state"), col("value"),
        col("ts"), col("event_id"))
  }

  /** A snapshot as readers see it: tombstoned keys dropped. */
  def visibleState(state: DataFrame): DataFrame =
    state.filter(col("state") =!= "error")
      .select(col("user_id"), col("state"), col("value"))

  /** One micro-batch advanced: compact the carried state with the new
    * events — the streaming CDF's state transition (the carried side
    * re-enters as events under its remembered ts/event_id, so
    * within-batch ordering and late arrivals resolve by the same
    * latest-wins rule as the batch query). */
  def advanceState(state: DataFrame, batch: DataFrame): DataFrame =
    stateOf(state
      .select(col("user_id"), col("state").as("event_type"), col("value"),
        col("ts"), col("event_id"))
      .unionByName(batch.select(col("user_id"), col("event_type"),
        col("value"), col("ts"), col("event_id"))))

  /** The I/U/D feed between two visible snapshots — s8's diff half,
    * shared by the registered batch query (two cutoff states of one
    * log) and the per-micro-batch monitor (previous vs advanced
    * state). */
  def snapshotDiffAgainst(previous: DataFrame, current: DataFrame): DataFrame = {
    val a = previous
      .select(col("user_id"), col("state").as("old_state"),
        col("value").as("old_value"))
    val b = current
      .select(col("user_id"), col("state").as("new_state"),
        col("value").as("new_value"))
    a.join(b, Seq("user_id"), "full_outer")
      .withColumn("op",
        when(col("old_state").isNull, lit("I"))
          .when(col("new_state").isNull, lit("D"))
          // NULL-safe (<=>): a state whose VALUE is null on one side
          // only must read as U, matching the oracle's IS DISTINCT
          // FROM — plain =!= returns null there and the row would
          // silently drop out of the feed
          .when(!(col("old_state") <=> col("new_state")) ||
            !(col("old_value") <=> col("new_value")), lit("U"))
          .otherwise(lit("=")))
      .filter(col("op") =!= "=")
      .select(col("user_id"), col("op"), col("old_state"), col("old_value"),
        col("new_state"), col("new_value"))
  }

  /** S11 — CDF APPLY, the MERGE half of s8's pair: consume the I/U/D
    * feed between the two shared cutoffs ([[DiffCutoff1]]/[[DiffCutoff2]])
    * against the cutoff-1 snapshot and emit the merged table — what a
    * lakehouse MERGE INTO does with the change feed a CDC source
    * publishes. The composition invariant is the point (x20's
    * discipline at the table-maintenance layer):
    * `applyCdf(state₁, diff(state₁, state₂)) == state₂`, pinned
    * bit-exactly by CdfApplySpec; here the registered query emits the
    * applied snapshot and the oracle restates the same merge.
    *
    * Scale: see [[applyCdf]] — the base table never shuffles. */
  def cdfApply(s: SparkSession, dir: String): DataFrame = {
    // prev feeds both the diff and the merge — persist per the
    // multi-consumer rule (one compacted row per user, never events)
    val prev = stateAtCutoff(s, dir, DiffCutoff1)
    CacheScope.persist(prev)
    applyCdf(prev,
        snapshotDiffAgainst(prev, stateAtCutoff(s, dir, DiffCutoff2)))
      .transform(Common.presented(_, col("user_id")))
  }

  /** MERGE semantics over a visible snapshot and an I/U/D feed: rows
    * whose key the feed never mentions carry over, I/U rows take the
    * feed's new image VERBATIM (including a null new_value — a
    * coalesce-style merge would silently resurrect the old value), D
    * rows vanish. The base side NEVER shuffles: untouched rows survive
    * a broadcast anti-join on the feed's keys and the upserts union in
    * — at 100 TB the feed tracks changed keys, not the table, so it
    * broadcasts (or bloom-prefilters, ap3) while the 100 TB base
    * streams through scan-bound. */
  def applyCdf(base: DataFrame, cdf: DataFrame): DataFrame = {
    val carried = base.join(broadcast(cdf.select(col("user_id"))),
      Seq("user_id"), "left_anti")
    val upserts = cdf.filter(col("op") =!= "D")
      .select(col("user_id"), col("new_state").as("state"),
        col("new_value").as("value"))
    carried.unionByName(upserts)
  }

  /** S7 — SCD Type-2 history reconstruction: turn the change log into
    * per-entity validity intervals — `valid_from` = the change's ts,
    * `valid_to` = the NEXT change's ts (open-ended for the current
    * row), `version` = change ordinal. This is the other half of S6's
    * CDC pair: S6 reconstructs "current state", S7 the full
    * slowly-changing-dimension history a warehouse joins facts against
    * (`FOR SYSTEM_TIME AS OF` is jx5's asof join over exactly this
    * shape).
    *
    * One exchange on user_id; `lead` and `row_number` share the single
    * (user_id × order) window frame, so both come from one sort within
    * the hash partition. Ordering uses the NORMALIZED ts (then
    * event_id) from [[eventsTs]] — both engines see the same physical
    * precision, so the version order agrees by construction. At
    * 100 TB: bucket the log by user_id and the exchange disappears;
    * appending a day's changes re-versions only the tail (max version
    * per entity, same partitioning). */
  def scd2(s: SparkSession, dir: String): DataFrame =
    scd2Core(s, dir)
      .transform(Common.presented(_, col("user_id"), col("version")))

  /** The s7 history rows pre-presentation — ONE definition shared with
    * s9's vacuum (a version/interval rule edit cannot desynchronize
    * the history from its retention job). */
  private def scd2Core(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    eventsTs(s, dir)
      .withColumn("version", row_number().over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(
        col("user_id"),
        col("version"),
        col("event_type").as("state"),
        col("value"),
        col("ts").as("valid_from"),
        col("next_ts").as("valid_to"),
        when(col("next_ts").isNull, 1).otherwise(0).as("is_current"))
  }

  /** s9's retention cutoff (inside the fixture's event range, the s8
    * constant convention). */
  val VacuumCutoff = "2024-01-15 00:00:00"

  /** S9 — SCD-2 history VACUUM audit: apply the retention policy "drop
    * CLOSED versions fully expired before [[VacuumCutoff]], never the
    * open row" to s7's history and emit the per-entity audit — versions
    * before, dropped, after, whether the current row survived (must be
    * 1 — the invariant the spec pins), and the earliest retained
    * valid_from. This is the reference's cleanup discipline
    * (`sink/InvoiceRetrySink.java` deletes claimed retry rows;
    * `TransactionalLogAndDeleteSink` log-and-deletes staged rows)
    * applied to the CDC history table — the unbounded-growth leak
    * SURVEY §2.10 flags, closed at the history layer the way x17
    * closes it at the index layer. One user_id window (shared with
    * s7's versioning) + one per-user conditional aggregate; at rest
    * the vacuum is a partition rewrite of the history table (x17's
    * dynamic-partition-overwrite discipline) and this audit is its
    * commit gate. */
  def historyVacuum(s: SparkSession, dir: String): DataFrame = {
    // timezone-explicit cutoff: parse the policy constant as a UTC wall
    // time and ship the resulting instant as a literal, so the retention
    // boundary cannot silently shift in an embedder running a non-UTC
    // spark.sql.session.timeZone (to_timestamp(lit(...)) would parse in
    // session tz; the DuckDB oracle's naive TIMESTAMP literal is UTC
    // under the harness convention)
    val cutoff = lit(java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(VacuumCutoff.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)))
    val drop = col("is_current") === 0 && col("valid_to") <= cutoff
    scd2Core(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_before"),
        sum(when(drop, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(!drop, 1L).otherwise(0L)).as("n_after"),
        max(col("is_current")).as("has_current"),
        min(when(!drop, col("valid_from"))).as("oldest_retained_from"))
      .transform(Common.presented(_, col("user_id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_scan_in" -> (scanIn _),
    "s7_scd2" -> (scd2 _),
    "s9_history_vacuum" -> (historyVacuum _),
    "s3_scan_out" -> (scanOut _),
    "s4_retry_claim" -> (retryClaim _),
    "s5_max_id" -> (maxId _),
    "s6_latest_snapshot" -> (latestSnapshot _),
    "s8_snapshot_diff" -> (snapshotDiff _),
    "s11_cdf_apply" -> (cdfApply _),
    "u1_union6" -> (union6 _),
    "u2_side_union" -> (sideUnion _))

  /** s8/s11's shared DuckDB CTEs: the two cutoff snapshots (S6's
    * latest-per-key rule, tombstones dropped) and the I/U/D feed
    * between them — ONE definition so the feed producer's oracle and
    * the apply consumer's can't drift. NULL-safe change test via IS
    * DISTINCT FROM (Spark's =!= on a U-row is never null because both
    * sides are present there). */
  private lazy val diffCtesSql: String =
    s"""st AS (SELECT user_id, event_type AS state, value,
       |              CAST(ts AS TIMESTAMP) AS tts, event_id
       |       FROM events),
       |a AS (SELECT user_id, state AS old_state, value AS old_value
       |      FROM st WHERE tts <= TIMESTAMP '$DiffCutoff1'
       |      QUALIFY row_number() OVER (PARTITION BY user_id
       |               ORDER BY tts DESC, event_id DESC) = 1 AND state <> 'error'),
       |b AS (SELECT user_id, state AS new_state, value AS new_value
       |      FROM st WHERE tts <= TIMESTAMP '$DiffCutoff2'
       |      QUALIFY row_number() OVER (PARTITION BY user_id
       |               ORDER BY tts DESC, event_id DESC) = 1 AND state <> 'error'),
       |cdf AS (SELECT user_id,
       |               CASE WHEN old_state IS NULL THEN 'I'
       |                    WHEN new_state IS NULL THEN 'D'
       |                    ELSE 'U' END AS op,
       |               old_state, old_value, new_state, new_value
       |        FROM a FULL JOIN b USING (user_id)
       |        WHERE old_state IS NULL OR new_state IS NULL
       |           OR old_state IS DISTINCT FROM new_state
       |           OR old_value IS DISTINCT FROM new_value)""".stripMargin

  val oracles: Map[String, String] = Map(
    "s8_snapshot_diff" ->
      s"""WITH $diffCtesSql
         |SELECT user_id, op, old_state, old_value, new_state, new_value
         |FROM cdf
         |ORDER BY user_id""".stripMargin,
    // s8's shared diff CTEs + the MERGE restated relationally:
    // untouched base rows anti-join the feed keys, I/U rows take the
    // feed's new image verbatim, D rows vanish
    "s11_cdf_apply" ->
      s"""WITH $diffCtesSql
         |SELECT user_id, state, value FROM (
         |  SELECT p.user_id, p.old_state AS state, p.old_value AS value
         |  FROM a p LEFT JOIN cdf c ON p.user_id = c.user_id
         |  WHERE c.user_id IS NULL
         |  UNION ALL
         |  SELECT user_id, new_state AS state, new_value AS value
         |  FROM cdf WHERE op <> 'D')
         |ORDER BY user_id""".stripMargin,
    // both engines window over the same physical ts precision (the
    // CAST is a no-op on timestamp[us] input), so the version order
    // agrees; ties break on event_id on both sides
    "s9_history_vacuum" ->
      s"""WITH h AS (SELECT user_id,
        |                  CAST(ts AS TIMESTAMP) AS valid_from,
        |                  CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS valid_to,
        |                  CASE WHEN lead(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END
        |                    AS is_current
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |m AS (SELECT *, CASE WHEN is_current = 0
        |                      AND valid_to <= TIMESTAMP '$VacuumCutoff'
        |                     THEN 1 ELSE 0 END AS dropped
        |      FROM h)
        |SELECT user_id,
        |       count(*) AS n_before,
        |       CAST(sum(dropped) AS BIGINT) AS n_dropped,
        |       CAST(sum(1 - dropped) AS BIGINT) AS n_after,
        |       CAST(max(is_current) AS INT) AS has_current,
        |       min(CASE WHEN dropped = 0 THEN valid_from END)
        |         AS oldest_retained_from
        |FROM m GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "s7_scd2" ->
      """SELECT user_id,
        |       CAST(row_number() OVER w AS INT) AS version,
        |       event_type AS state,
        |       value,
        |       CAST(ts AS TIMESTAMP) AS valid_from,
        |       CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS valid_to,
        |       CAST(CASE WHEN lead(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "s2_scan_in" ->
      """SELECT event_id, user_id, event_type, value, props, CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |WHERE event_type = 'click' AND user_id % 4 = 0 AND event_id > 3000
        |ORDER BY event_id LIMIT 2000""".stripMargin,
    "s3_scan_out" ->
      """SELECT event_id, user_id, event_type, value, props, CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |WHERE event_type = 'view' AND user_id % 4 = 1 AND event_id > 1000
        |ORDER BY event_id LIMIT 2000""".stripMargin,
    "s4_retry_claim" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS next_retry_time,
        |       'PROCESSING' AS claimed_state
        |FROM events
        |WHERE event_type = 'error' AND user_id % 5 = 2
        |  AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY next_retry_time, event_id LIMIT 100""".stripMargin,
    "s5_max_id" ->
      """SELECT CAST(coalesce(max(event_id), 0) AS BIGINT) AS max_id
        |FROM events
        |WHERE event_type = 'purchase' AND user_id % 4 = 2""".stripMargin,
    "s6_latest_snapshot" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |       value AS last_value, CAST(ts AS TIMESTAMP) AS last_ts
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-20 00:00:00'
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |         ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "u1_union6" ->
      """SELECT event_id, 'topic_' || event_type AS source_topic,
        |       CAST(NULL AS TINYINT) AS retry_count
        |FROM events
        |UNION ALL
        |SELECT event_id, 'retry_queue' AS source_topic,
        |       CAST(event_id % 5 AS TINYINT) AS retry_count
        |FROM events WHERE event_type = 'error' AND user_id % 5 = 2
        |ORDER BY source_topic, event_id""".stripMargin,
    "u2_side_union" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 5 > 3 THEN 'MAX_RETRY'
        |            WHEN user_id % 2 = 0 THEN 'DELETE'
        |            ELSE 'UPDATE' END AS tag,
        |       CASE WHEN event_id % 5 > 3 THEN 'invoice_error_log'
        |            ELSE 'invoice_retry' END AS sink_table
        |FROM events ORDER BY event_id""".stripMargin)
}
