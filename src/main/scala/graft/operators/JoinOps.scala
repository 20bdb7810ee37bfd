package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Common.dsum

/** Capability joins + sort/limit (SURVEY §2.6-2.7).
  *
  * The reference has no in-engine join — request↔response correlation
  * happens through the shared MySQL `async_inv_in` table (written at
  * `/root/reference/src/main/java/com/thaihoc/job/InvoiceRequest.java:118-157`,
  * read back at `source/AsyncInvInSource.java:55`). "Same capabilities"
  * requires expressing that lineage as a query, so the rebuild ships the
  * sid/syncid equi-join plus a broadcast-dimension variant.
  *
  * Scale notes: [[sidSyncidJoin]] is a large-large join → sort-merge on
  * the join keys, one shuffle per side, no driver involvement — this is
  * the plan that survives 100×. [[dimBroadcast]] keeps the fact-table scan
  * shuffle-free: dims are broadcast (`broadcast()` hint), so the only
  * shuffle is the final aggregation's — with map-side partial aggregation
  * the exchange carries one row per (nation, partition), not per order.
  */
object JoinOps {

  /** J1 — request ⋈ response on (sid, syncid)
    * (SURVEY §2.6; key fields extracted per
    * `InvoiceRequestTransformer.java:67-89`). Both sides derive from
    * `events` the way the staging tables derive from the request stream:
    * requests are every 3rd event, responses every 2nd, so matches are
    * exactly the event_id % 6 == 0 rows. */
  def sidSyncidJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val reqs = ev.filter(col("event_id") % 3 === 0)
      .select(
        concat(lit("S"), col("event_id")).as("sid"),
        concat(lit("Y"), col("event_id")).as("syncid"),
        col("event_id").as("req_id"),
        (lit(10) + col("event_id") % 5).cast("int").as("api_type"))
    val resps = ev.filter(col("event_id") % 2 === 0)
      .select(
        concat(lit("S"), col("event_id")).as("sid"),
        concat(lit("Y"), col("event_id")).as("syncid"),
        concat(lit("R"), col("user_id")).as("res_code"))
    reqs.join(resps, Seq("sid", "syncid"), "inner")
      .select(col("sid"), col("syncid"), col("req_id"), col("api_type"),
        col("res_code"))
      .transform(Common.presented(_, col("req_id")))
  }

  /** Broadcast-dimension join: orders ⋈ customer ⋈ nation, revenue by
    * nation. The dims (customer/nation at harness scale; nation/region
    * at 100 TB — broadcast whatever fits executor memory) go through
    * `broadcast()` so the orders scan never shuffles before the agg. */
  def dimBroadcast(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val nation = Tables.nation(s, dir)
    val dim = customer.join(broadcast(nation),
      col("c_nationkey") === col("n_nationkey"))
    orders.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("orders_cnt"))
      .transform(Common.presented(_, col("n_name")))
  }

  /** W1 — sort + limit / top-k (`AsyncInvInSource.java:55` `ORDER BY id
    * ASC LIMIT n` shape, stated as a standalone capability). Plans as
    * `TakeOrderedAndProject`: per-partition top-k, driver merges k·p rows
    * — never a global sort. */
  def topK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** A1 — scan-heavy aggregation over the largest table (TPC-H Q1
    * shape, per the driver contract's own example): partial (map-side)
    * aggregation collapses 600k lineitem rows to a handful of groups
    * before the single exchange; money math through exact decimal
    * accumulators (Common.dsum/davg — partition-order-independent,
    * SCALE.md float contract). The filter pushes to the parquet scan.
    * (A Common.spread here measured SLOWER — the single-threaded
    * shuffle write of 600k rows costs what the agg itself costs.) */
  def lineitemAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_date(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // avg as exact-sum ÷ count, a single double division — decimal
        // division scales differ between engines, double division of
        // identical operands cannot
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .transform(Common.presented(_, col("l_returnflag"), col("l_linestatus")))

  /** J3 — fact ⋈ two dims with a broadcast chain up to region: revenue
    * by (r_name via supplier nation, p_brand). lineitem is the only
    * large side — every dim broadcasts, so the fact scan reaches the
    * partial agg with zero shuffles. */
  def partSuppJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("r_name"), col("p_brand"))
      .agg(
        // exact decimal factors BEFORE the multiply: a double product
        // cast per-row to decimal could round differently per engine.
        // Factors are scaled longs (same HALF_UP values as the
        // decimal(18,4) casts — Common.scaledSum's contract), so the
        // per-row product and the group sum stay in primitive long
        // codegen; one decimal conversion per group restores the exact
        // decimal(38,8) total the decimal restatement produced.
        // decimal(28,0): any long fits in 19 digits, and (28,0)×(8,8)
        // lands on decimal(37,8) — INSIDE Spark's 38-digit cap, so the
        // product stays exact. A (38,0) cast here would make the
        // multiply type (47,8), which adjustPrecisionScale clamps to
        // (38,6) and silently HALF_UP-rounds the 8-decimal total.
        (sum((round(col("l_extendedprice") * 10000) *
              round((lit(1.0) - col("l_discount")) * 10000)).cast("long"))
          .cast("decimal(28,0)") * lit(new java.math.BigDecimal("0.00000001")))
          .cast("decimal(38,8)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .transform(Common.presented(_, col("r_name"), col("p_brand")))
  }

  /** A8 — the classic shipping-priority analytic (TPC-H Q3 shape):
    * segment-filtered customers ⋈ open orders ⋈ late-shipped lineitems,
    * revenue per order, top 10. The canonical "multi-join + agg +
    * top-k" plan: customer (filtered, small) broadcasts into orders,
    * that join result broadcasts into the lineitem scan, so the fact
    * table reaches its partial agg with ZERO pre-agg shuffles; the
    * top-10 is TakeOrderedAndProject (per-partition top-k + driver
    * merge of k·p rows — never a global sort). Revenue uses j3's
    * exact scaled-long product contract. At 100 TB orders stops
    * broadcasting and the plan degrades gracefully to one sort-merge
    * join on l_orderkey — same declarative program. */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_date(lit("1998-01-01"))
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(
        (sum((round(col("l_extendedprice") * 10000) *
              round((lit(1.0) - col("l_discount")) * 10000)).cast("long"))
          .cast("decimal(28,0)") * lit(new java.math.BigDecimal("0.00000001")))
          .cast("decimal(38,8)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** Shared asof-join inputs: clicks are the probe side, purchases the
    * state side — "the latest purchase by this user at or before the
    * click". Column names are pre-disambiguated so the joined output
    * needs no qualification. */
  private[operators] def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = ScanOps.eventsTs(s, dir)
    // null keys / timestamps can never match under asof (equi-join null
    // semantics + an unordered ts): filter them HERE so the window
    // restatement (whose partitionBy would otherwise group the null
    // keys together) and the custom exec see identical inputs
    val l = ev.filter(col("event_type") === "click" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = ev.filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    (l, r)
  }

  private[operators] val asofOutCols = Seq("l_event_id", "user_id", "l_ts", "l_value",
    "r_event_id", "r_ts", "r_value").map(col)

  /** JX8 — `FOR SYSTEM_TIME AS OF` as a composition: probe each click
    * against the SCD-2 dimension S7 builds (here: the user's
    * signup/purchase change history), matching the version whose
    * validity interval contains the click. Because SCD-2 intervals
    * tile each user's timeline ([valid_from, next valid_from)), "the
    * interval containing ts" IS "the latest change ≤ ts" — so the
    * temporal-table lookup needs no interval join at all, just the
    * jx5 as-of merge against the change log, with `version`/`state`
    * riding along. One shuffle+sort per side (none when both are
    * bucketed by user_id, ScaleSpec's layout), O(1) merge state —
    * the warehouse point-in-time enrichment at any scale. */
  def pitScd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = ScanOps.eventsTs(s, dir)
    // Pre-dedup the dimension to ONE change per (user_id, µs-truncated
    // ts): two sub-µs changes collapse to the same state_since after
    // truncation, and an as-of match against duplicate keys is
    // engine-arbitrary (DuckDB ASOF picks an unspecified row among
    // ties). Keeping the max-event_id row per group — via lead() over
    // the SAME (user_id)-partitioned sort the version numbering uses,
    // so dedup adds no extra exchange — makes state_since unique per
    // user and both the as-of match and state_version deterministic.
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dim = ev.filter(col("event_type").isin("signup", "purchase") &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("nxt_ts", lead(col("ts"), 1).over(wUser))
      .filter(col("nxt_ts").isNull || col("nxt_ts") =!= col("ts"))
      .withColumn("state_version", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"))))
      .select(col("user_id").as("r_user"), col("ts").as("state_since"),
        col("event_type").as("state"), col("value").as("state_value"),
        col("state_version"))
    val probe = ev.filter(col("event_type") === "click" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"))
    graft.plans.AsofJoin.asof(probe, dim,
        Seq(probe("user_id")), Seq(dim("r_user")),
        probe("l_ts"), dim("state_since"))
      .select(col("l_event_id"), col("user_id"), col("l_ts"),
        col("state"), col("state_version"), col("state_since"),
        col("state_value"))
      .transform(Common.presented(_, col("l_event_id")))
  }

  /** JX4 — as-of join, composable restatement (the (a)-tier from the
    * brief's custom-operator ladder): tag and union both sides, sort
    * each user's timeline with right rows first at equal ts (inclusive
    * bound), carry the right columns forward with
    * `last(_, ignoreNulls)` over a running frame, keep matched left
    * rows. Correct everywhere Spark runs, but the union of BOTH inputs
    * (right columns null-padded) crosses one shuffle and one sort. */
  def asofWindow(s: SparkSession, dir: String): DataFrame = {
    val (l, r) = asofSides(s, dir)
    val u = l.withColumn("side", lit(1))
      .unionByName(
        r.withColumnRenamed("r_user", "user_id").withColumn("side", lit(0)),
        allowMissingColumns = true)
      .withColumn("ets", coalesce(col("l_ts"), col("r_ts")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ets"), col("side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // ONE struct per right row, not one last() per column: independent
    // per-column carries would stitch an output row from DIFFERENT
    // right rows whenever a matched column is individually null
    u.withColumn("m", last(
        when(col("side") === 0,
          struct(col("r_event_id"), col("r_ts"), col("r_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("m").isNotNull)
      .select(col("l_event_id"), col("user_id"), col("l_ts"), col("l_value"),
        col("m.r_event_id").as("r_event_id"), col("m.r_ts").as("r_ts"),
        col("m.r_value").as("r_value"))
      .transform(Common.presented(_, col("l_event_id")))
  }

  /** JX5 — as-of join through the custom operator
    * ([[graft.plans.AsofJoin]]): one shuffle per SIDE on the key, O(1)
    * merge state per partition, no null-padded union through the
    * exchange. Same oracle as JX4 — the two must agree bit-for-bit. */
  def asofNative(s: SparkSession, dir: String): DataFrame = {
    val (l, r) = asofSides(s, dir)
    graft.plans.AsofJoin.asof(l, r,
        Seq(l("user_id")), Seq(r("r_user")), l("l_ts"), r("r_ts"))
      .select(asofOutCols: _*)
      .transform(Common.presented(_, col("l_event_id")))
  }

  /** JX7 — as-of join with a match-window TOLERANCE (the kdb/pandas
    * `merge_asof(tolerance=...)` surface): a click only matches a
    * purchase at most one hour older. Needs NO new operator: the inner
    * as-of picks the LATEST right row ≤ l_ts, and if that row is
    * outside the window then no in-tolerance match exists at all, so
    * tolerance is exactly a post-join filter over the matched pair —
    * the planner keeps it above the merge, and rows outside the window
    * drop like unmatched keys. Same shape at any scale as JX5. */
  def asofTolerance(s: SparkSession, dir: String): DataFrame = {
    val (l, r) = asofSides(s, dir)
    graft.plans.AsofJoin.asof(l, r,
        Seq(l("user_id")), Seq(r("r_user")), l("l_ts"), r("r_ts"))
      .filter(col("r_ts") >= col("l_ts") - expr("INTERVAL 1 HOUR"))
      .select(asofOutCols: _*)
      .transform(Common.presented(_, col("l_event_id")))
  }

  /** Interval width of the JX6 attribution windows and of the buckets
    * that cover them — equal by construction, so every range spans at
    * most two buckets (the `sequence` generalizes to wider ranges). */
  private val RangeBucketMicros = 7200000000L // 2 hours

  /** JX6 — bucketed range join (the brief's other "operator Spark
    * lacks"): each click joins EVERY purchase window of the same user
    * containing it (`l_ts ∈ [win_start, win_end)`). Spark plans a raw
    * inequality join as BroadcastNestedLoopJoin — per-pair work that's
    * quadratic per key at scale. The scale path: explode each range
    * into the fixed-width buckets it covers, equi-join on
    * (user, bucket) — the probe row's single bucket meets each range
    * at most once, so no pair dedup — then filter exact containment.
    * One hash shuffle per side, pair space bounded by bucket
    * occupancy, AQE-splittable under skew. */
  def rangeBucketed(s: SparkSession, dir: String): DataFrame = {
    val ev = ScanOps.eventsTs(s, dir)
    // `div` (not `/`): exact integer bucket arithmetic — double division
    // plus truncation is one ulp away from a wrong bucket at a boundary
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"),
        expr(s"unix_micros(ts) div $RangeBucketMicros").as("bkt"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("win_end"))
      .withColumn("bkt", explode(sequence(
        expr(s"unix_micros(win_start) div $RangeBucketMicros"),
        expr(s"unix_micros(win_end) div $RangeBucketMicros"))))
    l.join(r, col("user_id") === col("r_user") && l("bkt") === r("bkt") &&
        col("l_ts") >= col("win_start") && col("l_ts") < col("win_end"))
      .select(col("l_event_id"), col("user_id"), col("l_ts"),
        col("r_event_id"), col("win_start"))
      .transform(Common.presented(_, col("l_event_id"), col("r_event_id")))
  }

  /** J5 — FULL OUTER join (§2.6 surface completion: inner j1, broadcast
    * j2/j3, semi j4, anti k3, as-of jx4-jx8 — full-outer is the last
    * join type): the request/response reconciliation report, where
    * unmatched rows on EITHER side are the interesting ones (requests
    * never answered, responses never requested). Sort-merge full outer
    * — one shuffle per side, no broadcast (full-outer cannot broadcast:
    * both sides must surface their unmatched rows). USING(sid)
    * coalesces the key on both engines. */
  def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val reqs = ev.filter(col("event_id") % 3 === 0)
      .select(concat(lit("S"), col("event_id")).as("sid"),
        col("event_id").as("req_id"))
    val resps = ev.filter(col("event_id") % 2 === 0)
      .select(concat(lit("S"), col("event_id")).as("sid"),
        col("event_id").as("res_id"),
        concat(lit("R"), col("user_id")).as("res_code"))
    reqs.join(resps, Seq("sid"), "full_outer")
      .select(col("sid"), col("req_id"), col("res_id"), col("res_code"),
        when(col("req_id").isNotNull && col("res_id").isNotNull, lit("matched"))
          .when(col("req_id").isNotNull, lit("request_only"))
          .otherwise(lit("response_only")).as("side"))
      .transform(Common.presented(_, col("sid")))
  }

  /** J4 — left-semi join (§2.6 surface completion; k3 covers anti):
    * orders with at least one heavy lineitem. Semi ships NO columns
    * from the right side and stops probing a key at the first match —
    * at 100 TB that's materially cheaper than inner-join + distinct. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .transform(Common.presented(_, col("o_orderkey")))
  }

  /** A5 — multi-distinct aggregation: two COUNT(DISTINCT) over
    * different columns plus a plain sum in one pass. Catalyst plans
    * this with an Expand (one replicate per distinct group) feeding a
    * two-stage aggregate — the standard shape; at 100 TB the Expand
    * multiplier (here 3x) is the cost knob, and AP1's HLL sketch is
    * the constant-memory alternative when exactness can be traded. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        dsum(col("l_quantity")).as("sum_qty"))
      .transform(Common.presented(_, col("l_returnflag")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j4_semi" -> (semiJoin _),
    "j5_full_outer" -> (fullOuterJoin _),
    "a5_distinct_agg" -> (distinctAgg _),
    "jx4_asof_window" -> (asofWindow _),
    "jx5_asof_native" -> (asofNative _),
    "jx6_range_bucketed" -> (rangeBucketed _),
    "jx7_asof_tolerance" -> (asofTolerance _),
    "jx8_pit_scd2" -> (pitScd2 _),
    "j1_sid_syncid" -> (sidSyncidJoin _),
    "j2_dim_broadcast" -> (dimBroadcast _),
    "a8_ship_priority" -> (shippingPriority _),
    "j3_part_supp" -> (partSuppJoin _),
    "a1_lineitem_agg" -> (lineitemAgg _),
    "w1_topk" -> (topK _))

  private[operators] val asofOracle =
    """WITH l AS (SELECT event_id AS l_event_id, user_id,
      |                  CAST(ts AS TIMESTAMP) AS l_ts, value AS l_value
      |           FROM events WHERE event_type = 'click'),
      |r AS (SELECT event_id AS r_event_id, user_id AS r_user,
      |             CAST(ts AS TIMESTAMP) AS r_ts, value AS r_value
      |      FROM events WHERE event_type = 'purchase')
      |SELECT l_event_id, user_id, l_ts, l_value, r_event_id, r_ts, r_value
      |FROM l ASOF JOIN r ON l.user_id = r.r_user AND r.r_ts <= l.l_ts
      |ORDER BY l_event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "j5_full_outer" ->
      """WITH reqs AS (SELECT 'S' || CAST(event_id AS VARCHAR) AS sid,
        |                     event_id AS req_id
        |              FROM events WHERE event_id % 3 = 0),
        |resps AS (SELECT 'S' || CAST(event_id AS VARCHAR) AS sid,
        |                 event_id AS res_id,
        |                 'R' || CAST(user_id AS VARCHAR) AS res_code
        |          FROM events WHERE event_id % 2 = 0)
        |SELECT sid, req_id, res_id, res_code,
        |       CASE WHEN req_id IS NOT NULL AND res_id IS NOT NULL THEN 'matched'
        |            WHEN req_id IS NOT NULL THEN 'request_only'
        |            ELSE 'response_only' END AS side
        |FROM reqs FULL JOIN resps USING (sid)
        |ORDER BY sid""".stripMargin,
    "j4_semi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "a5_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_suppliers,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "jx4_asof_window" -> asofOracle,
    "jx5_asof_native" -> asofOracle,
    // temporal-table lookup == as-of against the change log (intervals
    // tile the timeline), so DuckDB's ASOF JOIN is the exact oracle.
    // The dim dedups to the max-event_id change per (user, µs ts) —
    // mirroring the Spark side — so ASOF never faces tied state_since
    // keys (where its pick among duplicates is unspecified).
    "jx8_pit_scd2" ->
      """WITH chg AS (SELECT user_id AS r_user, CAST(ts AS TIMESTAMP) AS state_since,
        |                    event_type AS state, value AS state_value,
        |                    row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
        |                      ORDER BY event_id DESC) AS rn
        |             FROM events
        |             WHERE event_type IN ('signup', 'purchase')),
        |dim AS (SELECT r_user, state_since, state, state_value,
        |               CAST(row_number() OVER (PARTITION BY r_user
        |                 ORDER BY state_since) AS INT) AS state_version
        |        FROM chg WHERE rn = 1),
        |probe AS (SELECT event_id AS l_event_id, user_id,
        |                 CAST(ts AS TIMESTAMP) AS l_ts
        |          FROM events WHERE event_type = 'click')
        |SELECT l_event_id, user_id, l_ts, state, state_version, state_since, state_value
        |FROM probe ASOF JOIN dim
        |  ON probe.user_id = dim.r_user AND dim.state_since <= probe.l_ts
        |ORDER BY l_event_id""".stripMargin,
    // DuckDB's native ASOF picks the same latest-at-or-before row, so
    // the tolerance restates as the identical post-join predicate —
    // applied in an OUTER block behind a MATERIALIZED barrier: DuckDB
    // inlines plain CTEs and folds the WHERE into the ASOF ON clause,
    // rejecting the second inequality ("Multiple ASOF JOIN
    // inequalities")
    "jx7_asof_tolerance" ->
      s"""WITH m AS MATERIALIZED ($asofOracle)
         |SELECT * FROM m
         |WHERE r_ts >= l_ts - INTERVAL 1 HOUR
         |ORDER BY l_event_id""".stripMargin,
    "jx6_range_bucketed" ->
      """WITH l AS (SELECT event_id AS l_event_id, user_id,
        |                  CAST(ts AS TIMESTAMP) AS l_ts
        |           FROM events WHERE event_type = 'click'),
        |r AS (SELECT event_id AS r_event_id, user_id AS r_user,
        |             CAST(ts AS TIMESTAMP) AS win_start,
        |             CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS win_end
        |      FROM events WHERE event_type = 'purchase')
        |SELECT l_event_id, user_id, l_ts, r_event_id, win_start
        |FROM l JOIN r ON l.user_id = r.r_user
        |            AND l.l_ts >= r.win_start AND l.l_ts < r.win_end
        |ORDER BY l_event_id, r_event_id""".stripMargin,
    "j1_sid_syncid" ->
      """SELECT 'S' || CAST(r.event_id AS VARCHAR) AS sid,
        |       'Y' || CAST(r.event_id AS VARCHAR) AS syncid,
        |       r.event_id AS req_id,
        |       CAST(10 + r.event_id % 5 AS INT) AS api_type,
        |       'R' || CAST(p.user_id AS VARCHAR) AS res_code
        |FROM events r JOIN events p ON r.event_id = p.event_id
        |WHERE r.event_id % 3 = 0 AND p.event_id % 2 = 0
        |ORDER BY req_id""".stripMargin,
    "j2_dim_broadcast" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS orders_cnt
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "w1_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "a8_ship_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    "a1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "j3_part_supp" ->
      """SELECT r_name, p_brand,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |                * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY r_name, p_brand
        |ORDER BY r_name, p_brand""".stripMargin)
}
