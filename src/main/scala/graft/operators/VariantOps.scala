package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semi-structured VARIANT operators (Spark 4's open variant encoding)
  * — the engine's answer to heterogeneous JSON at 100 TB, complementing
  * the schema-full `from_json` path of T3/T7: parse ONCE into the
  * binary variant encoding, then extract typed paths lazily per query.
  * At scale the variant column is written to parquet (shredded binary +
  * metadata dictionary), so repeated queries never re-tokenize JSON
  * text, and path extraction is a dictionary lookup instead of a string
  * scan — the published rationale for the type (Spark's
  * `VariantType` / parquet variant logical type). Outputs project to
  * plain types so the driver's comparer and the DuckDB oracle see
  * ordinary columns; the variant stays internal to the plan.
  *
  * v1 replays T3's nested-fallback extraction
  * (`/root/reference/src/main/java/com/thaihoc/process/request/InvoiceRequestTransformer.java:55-96`)
  * through `parse_json` + `try_variant_get` over the REAL varying
  * element JSON (field placement differs row to row — exactly the
  * schema-drift case variant exists for), against the same
  * field-arithmetic oracle as T3 (any parse/extract bug surfaces as a
  * value mismatch). v2 parses the events table's raw `props` JSON on
  * BOTH engines — Spark through variant, DuckDB through its JSON type —
  * so the compared surface is two independent parsers over identical
  * text. */
object VariantOps {

  /** V1 — nested-fallback extraction via variant paths: top-level field
    * first, then `$.inv.<field>` — `try_variant_get` yields NULL for a
    * missing path, so the fallback chain is a plain `coalesce`, exactly
    * as the struct-field version in RequestOps. No validation filter:
    * the projection itself (all 10k rows, nulls where every probe
    * missed) is the compared surface. */
  def variantExtract(s: SparkSession, dir: String): DataFrame = {
    // parse ONCE into an aliased column: CollapseProject keeps a
    // multiply-referenced non-cheap alias in its own Project, so the
    // seven path probes share one parse instead of re-tokenizing per
    // probe (measured 1.8 s → parse-once at sf0.1; the same reason the
    // round-4 payload surface parses once, RequestOps.withElementJson)
    def vg(path: String) = try_variant_get(col("v"), path, "string")
    // the serialize+parse roundtrip is the one genuinely CPU-bound
    // stage over this single-row-group scan (measured 1.8 s on ONE
    // partition at sf0.1): spread the slim 2-column input across the
    // session's shuffle width BEFORE the heavy Project. The width is
    // PINNED (AQE coalesces an expression-only repartition of MB-sized
    // data right back to one partition — observed); at 100 TB the scan
    // arrives pre-split and this exchange disappears entirely
    RequestOps.withElementJson(
        Tables.events(s, dir).repartition(
          s.sessionState.conf.numShufflePartitions, col("event_id")))
      .withColumn("v", parse_json(col("j")))
      .select(
        col("event_id"),
        coalesce(vg("$.stax"), vg("$.inv.stax")).as("stax"),
        coalesce(vg("$.sid"), vg("$.inv.sid")).as("sid"),
        coalesce(vg("$.syncid"), vg("$.inv.syncid")).as("syncid"),
        try_variant_get(col("v"), "$.api_type", "int").as("api_type"))
      .transform(Common.presented(_, col("event_id")))
  }

  /** V2 — typed aggregation over variant-extracted values from the raw
    * `props` JSON column: both engines parse the same text with their
    * own JSON machinery, so the hash gate cross-checks the parsers, not
    * a shared restatement. Exact integer aggregates only. */
  def variantProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .transform(Common.presented(_, col("event_type")))

  /** V3 — malformed-input routing, the bad-data reality at 100 TB: a
    * deterministic corruption (truncate the raw `props` JSON for
    * event_id % 7 == 3) feeds `try_parse_json`, whose NULL routes the
    * row to a MALFORMED leg instead of failing the job — the streaming
    * pipelines' element-scoped failure containment, restated for batch
    * ingest. Both engines judge the IDENTICAL corrupted text with
    * their own parser (Spark: try_parse_json; DuckDB: json_valid), so
    * the hash gate cross-checks accept/reject agreement row by row. */
  def malformedRoute(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .repartition(s.sessionState.conf.numShufflePartitions,
        col("event_id")) // CPU-bound parse over a single-row-group scan (see v1)
      .withColumn("raw",
        when(col("event_id") % 7 === 3,
          expr("substring(props, 1, length(props) - 2)"))
          .otherwise(col("props")))
      .withColumn("v", try_parse_json(col("raw")))
      .select(
        col("event_id"),
        when(col("v").isNull, lit("MALFORMED")).otherwise(lit("OK")).as("route"),
        try_variant_get(col("v"), "$.k", "long").as("k"))
      .transform(Common.presented(_, col("event_id")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_variant_extract" -> (variantExtract _),
    "v2_variant_props" -> (variantProps _),
    "v3_malformed_route" -> (malformedRoute _))

  val oracles: Map[String, String] = Map(
    // same field arithmetic as the T3 oracle, unfiltered (see
    // RequestOps.withElementJson for the placement scheme)
    "v1_variant_extract" ->
      """SELECT event_id,
        |       CASE WHEN user_id % 3 <= 1 THEN 'T' || CAST(user_id AS VARCHAR) END AS stax,
        |       CASE WHEN event_id % 3 <= 1 THEN 'S' || CAST(event_id AS VARCHAR) END AS sid,
        |       CASE WHEN event_id % 2 = 0 THEN 'Y' || CAST(event_id AS VARCHAR) END AS syncid,
        |       CASE WHEN event_id % 7 <> 6 THEN CAST(10 + event_id % 7 AS INT) END AS api_type
        |FROM events ORDER BY event_id""".stripMargin,
    "v2_variant_props" ->
      """SELECT event_type,
        |       count(*) AS n_events,
        |       count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
        |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "v3_malformed_route" ->
      """SELECT event_id,
        |       CASE WHEN json_valid(raw) THEN 'OK' ELSE 'MALFORMED' END AS route,
        |       CASE WHEN json_valid(raw) THEN CAST(raw->>'$.k' AS BIGINT) END AS k
        |FROM (SELECT event_id,
        |             CASE WHEN event_id % 7 = 3
        |                  THEN substring(props, 1, length(props) - 2)
        |                  ELSE props END AS raw
        |      FROM events)
        |ORDER BY event_id""".stripMargin)
}
