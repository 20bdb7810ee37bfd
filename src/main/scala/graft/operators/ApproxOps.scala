package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate aggregates (AP1/AP2) — the sketches that replace exact
  * operators once exact stops scaling.
  *
  * At 100 TB an exact COUNT(DISTINCT) shuffles every distinct value and
  * an exact percentile shuffles every row into a sort; the sketch forms
  * aggregate to a few KB per group map-side and merge associatively in
  * the reduce — same single-exchange plan shape as a plain sum, *at any
  * data size*. Spark's built-ins: HyperLogLog++ for distinct counts
  * (`approx_count_distinct`, default 5% relative SD) and a mergeable
  * quantile summary for percentiles (`percentile_approx`).
  *
  * These two queries intentionally have NO DuckDB oracle: both engines
  * implement different sketch algorithms, so estimates differ by
  * design — the driver records the weaker rows-only check, and
  * ApproxOpsSpec pins the accuracy contract instead (estimate within
  * the published error bound of the exact value computed on the same
  * data). Exact companions ride along in the output so the error is
  * visible per group. */
object ApproxOps {

  /** AP1 — per-event-type distinct users: HLL++ estimate next to the
    * exact count (exact is affordable at harness scale; at 100 TB the
    * exact column is what you delete). */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** AP2 — value quantiles per event_type: mergeable-sketch percentiles
    * next to the exact ones (Spark's exact `percentile` is a full sort
    * per group under the hood — the thing the sketch replaces). */
  def quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)),
          lit(10000)).as("approx_q"),
        expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("exact_q"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        col("approx_q")(0).as("approx_p50"),
        col("approx_q")(1).as("approx_p95"),
        col("approx_q")(2).as("approx_p99"),
        col("exact_q")(0).as("exact_p50"),
        col("exact_q")(1).as("exact_p95"),
        col("exact_q")(2).as("exact_p99"),
        col("n_events"))
      .orderBy(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ap1_hll_distinct" -> (hllDistinct _),
    "ap2_quantiles" -> (quantiles _))

  /** No oracles — sketch estimates are engine-specific (see class doc);
    * the driver's rows-only check plus ApproxOpsSpec's error-bound
    * assertions are the correctness story. */
  val oracles: Map[String, String] = Map.empty
}
