package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Common.dsum

/** Multi-level aggregation surface (A2-A4): ROLLUP, CUBE and PIVOT.
  *
  * The reference's only aggregations are the MAX-bootstrap and the
  * count-batcher (SURVEY §2.5); these are the standard OLAP
  * restatements an analytics engine is expected to carry. All three
  * are single-shuffle plans: Spark expands grouping sets BEFORE the
  * exchange (each input row fans into one row per matching grouping
  * set, partially aggregated map-side), and pivot is a plain
  * hash-aggregate whose cells are conditional sums — no extra pass,
  * no per-value scan. At 100 TB the fan-out factor (3 for a 2-col
  * rollup, 4 for a 2-col cube) multiplies the shuffle write, which is
  * the usual argument for rolling up FROM a pre-aggregated cube level
  * rather than from raw facts when both levels are needed.
  *
  * A `gl` grouping-level column (grouping(a)·2 + grouping(b)) makes
  * each output row's provenance explicit and gives the deterministic
  * ORDER BY the hash-compare needs: within one gl value the nulled-out
  * key columns are constant, so ordering by the remaining keys is
  * total without any NULLS FIRST/LAST divergence between engines. */
object AggOps {

  /** A2 — ROLLUP (l_returnflag, l_linestatus): detail, per-flag
    * subtotal, grand total in one pass. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gl"),
        count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gl"),
        col("n_items"), col("sum_qty"))
      .transform(Common.presented(_, col("gl"), col("l_returnflag"), col("l_linestatus")))

  /** A9 — arbitrary GROUPING SETS: the general surface rollup/cube are
    * special cases of — here {(flag, status), (status), ()}, a set
    * collection NO rollup can express (the (status)-only subtotal
    * skips the (flag) level). Same single-shuffle plan as a2/a3:
    * Expand fans each input row into its matching sets BEFORE the
    * exchange, partial aggregation still applies. */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gl"),
        count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gl"),
        col("n_items"), col("sum_qty"))
      .transform(Common.presented(_, col("gl"), col("l_returnflag"), col("l_linestatus")))

  /** A3 — CUBE (o_orderstatus, o_orderpriority): all four grouping
    * sets of the order dimensions. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("int").as("gl"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gl"),
        col("n_orders"), col("sum_price"))
      .transform(Common.presented(_, col("gl"), col("o_orderstatus"), col("o_orderpriority")))

  /** Pivot columns are an explicit list — with an inferred list the
    * plan needs a driver-side distinct scan first, and the output
    * schema becomes data-dependent (breaks at scale AND breaks the
    * oracle's fixed column set). */
  val EventTypes = Seq("click", "view", "error", "purchase", "signup")

  /** A4 — PIVOT: per user-cohort value sums, one column per event
    * type. */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("cohort", col("user_id") % 10)
      .groupBy(col("cohort"))
      .pivot("event_type", EventTypes)
      .agg(dsum(col("value")))
      .transform(Common.presented(_, col("cohort")))

  /** A6 — nested-type OUTPUT surface: per user, the first three
    * (event_id, value) pairs as an `array<struct>` plus a summary
    * `struct` — columnar nested results, not flattened columns and not
    * JSON strings (the G4 packets serialize; this keeps the type).
    * AggOpsSpec covers this typed surface; the REGISTERED query is
    * [[nestedAggJson]] because the driver's comparer pandas-sorts
    * every column before hashing and nested cells are unhashable
    * there — the compared surface must be strings. */
  def nestedAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // pre-rank instead of collect_list-then-slice: the rank filter gets
    // WindowGroupLimit's map-side top-k pruning, so no group ever
    // buffers more than 3 structs — collect-everything-keep-3 is the
    // exact anti-pattern T2 documents
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"), col("value"))
    val top3 = ev
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("value"))))
        .as("top3"))
    val stats = ev.groupBy(col("user_id"))
      .agg(struct(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value")).as("stats"))
    top3.join(stats, Seq("user_id"))
      .select(col("user_id"), col("top3"), col("stats"))
  }

  /** A6 compare surface: same plan as [[nestedAgg]] with the nested
    * columns serialized through `to_json` — both engines emit compact
    * JSON with fields in struct-declaration order, so the strings are
    * byte-identical when the typed values are. The one formatting
    * hazard is DOUBLE (Java and DuckDB shortest-roundtrip printers can
    * disagree on rare values), so doubles are pinned to
    * `DECIMAL(18,4)`-as-string inside the JSON on both sides; longs
    * and strings serialize identically everywhere. */
  def nestedAggJson(s: SparkSession, dir: String): DataFrame =
    nestedAgg(s, dir).select(
      col("user_id"),
      to_json(transform(col("top3"), x => struct(
        x.getField("event_id").as("event_id"),
        x.getField("value").cast("decimal(18,4)").cast("string").as("value"))))
        .as("top3"),
      to_json(struct(
        col("stats").getField("n").as("n"),
        col("stats").getField("sum_value").cast("decimal(18,4)").cast("string")
          .as("sum_value"))).as("stats"))
      .transform(Common.presented(_, col("user_id")))

  /** A7 — map-typed OUTPUT: per cohort, event_type → count as a real
    * MAP column (completing the complex-type surface next to A6's
    * struct/array). Entries are built in sorted-key order on BOTH
    * engines so the columnar map serialization is byte-stable. Typed
    * surface spec-covered; registered query is [[mapAggJson]] (same
    * driver-comparer constraint as A6). */
  def mapAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy((col("user_id") % 5).as("cohort"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cohort"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("type_counts"))

  /** A7 compare surface: the map serialized to JSON. All values are
    * long/string, and the map was built in sorted-key order on both
    * engines, so key order and number formatting agree byte-for-byte. */
  def mapAggJson(s: SparkSession, dir: String): DataFrame =
    mapAgg(s, dir)
      .select(col("cohort"), to_json(col("type_counts")).as("type_counts"))
      .transform(Common.presented(_, col("cohort")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a7_map" -> (mapAggJson _),
    "a2_rollup" -> (rollupAgg _),
    "a9_grouping_sets" -> (groupingSetsAgg _),
    "a3_cube" -> (cubeAgg _),
    "a4_pivot" -> (pivotAgg _),
    "a6_nested" -> (nestedAggJson _))

  private val pivotCells = EventTypes.map { t =>
    s"""CAST(SUM(CASE WHEN event_type = '$t'
       |         THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS "$t"""".stripMargin
  }.mkString(",\n       ")

  val oracles: Map[String, String] = Map(
    "a2_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gl,
        |       count(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gl, l_returnflag, l_linestatus""".stripMargin,
    "a9_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gl,
        |       count(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gl, l_returnflag, l_linestatus""".stripMargin,
    "a3_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gl,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gl, o_orderstatus, o_orderpriority""".stripMargin,
    "a4_pivot" ->
      s"""SELECT user_id % 10 AS cohort,
         |       $pivotCells
         |FROM events
         |GROUP BY user_id % 10
         |ORDER BY cohort""".stripMargin,
    "a7_map" ->
      """SELECT cohort,
        |       CAST(to_json(map_from_entries(
        |              list(struct_pack(k := event_type, v := cnt)
        |                   ORDER BY event_type))) AS VARCHAR) AS type_counts
        |FROM (SELECT user_id % 5 AS cohort, event_type, count(*) AS cnt
        |      FROM events GROUP BY 1, 2)
        |GROUP BY cohort
        |ORDER BY cohort""".stripMargin,
    "a6_nested" ->
      """WITH base AS (
        |  SELECT user_id,
        |         list_slice(list_sort(list(struct_pack(event_id := event_id,
        |                                               value := value))), 1, 3) AS top3,
        |         count(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM events
        |  GROUP BY user_id)
        |SELECT user_id,
        |       CAST(to_json(list_transform(top3, x -> struct_pack(
        |              event_id := x.event_id,
        |              value := CAST(CAST(x.value AS DECIMAL(18,4)) AS VARCHAR))))
        |         AS VARCHAR) AS top3,
        |       CAST(to_json(struct_pack(n := n,
        |              sum_value := CAST(CAST(sum_value AS DECIMAL(18,4)) AS VARCHAR)))
        |         AS VARCHAR) AS stats
        |FROM base
        |ORDER BY user_id""".stripMargin)
}
