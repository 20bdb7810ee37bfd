package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-parity queries.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `SparkEntry.oracleSql` text over the same input tables. Two rules keep
  * that comparison byte-stable:
  *
  *   1. Floating-point aggregation order differs between engines (Spark
  *      sums partials per shuffle partition; DuckDB sums sequentially), so
  *      every SUM/AVG over a double column goes through an exact
  *      decimal(18,4) accumulator and is only converted back to double at
  *      the end — the same value regardless of partitioning. At 100 TB
  *      this matters for a second reason: partial (map-side) decimal
  *      aggregation stays exact under any AQE re-plan, so results are
  *      reproducible run-to-run.
  *   2. Every query orders its output by a unique key so row order is
  *      identical on both sides.
  */
object Common {
  /** The exact decimal(28,4) group total behind [[dsum]]/[[davg]],
    * accumulated as a SCALED LONG: per row `round(c·10⁴)` (same
    * HALF_UP result as `CAST(c AS DECIMAL(18,4))` for any double
    * whose 10⁴-multiple rounds on the same side — DecimalScaleSpec
    * pins the equivalence over every aggregated column in the test
    * tables), summed as a primitive long inside whole-stage codegen,
    * and converted back to decimal(28,4) ONCE per group. The direct
    * `sum(DECIMAL)` restatement allocates a `Decimal` object per row
    * and measured 3× the whole query's agg cost (a1: 0.9 s vs 0.3 s
    * at sf0.1).
    *
    * Domain: exact while the GROUP total satisfies |Σc|·10⁴ < 2⁶³,
    * i.e. group totals under ~9.2·10¹⁴. That bound is REAL at the
    * 100 TB design point: global TPC-H revenue at SF ~100k is ~2·10¹⁶,
    * so a handful-of-groups rollup like a1 (~6 groups, ~3·10¹⁵ each)
    * crosses it. Crossing is LOUD, not silent: Spark 4 runs ANSI mode
    * by default, so the long accumulator raises ARITHMETIC_OVERFLOW
    * the moment a partial sum exceeds 2⁶³ (DecimalScaleSpec pins
    * this), and the remedy is substituting
    * `sum(c.cast(DecimalType(18, 4)))` — same value, decimal-speed.
    * Do NOT run money aggregates with `spark.sql.ansi.enabled=false`:
    * that config turns this exact overflow into a silent wrap. */
  private def scaledSum(c: Column): Column =
    (sum(round(c * 10000).cast("long")).cast(DecimalType(28, 0)) *
      lit(new java.math.BigDecimal("0.0001")))
      .cast(DecimalType(28, 4))

  /** Partition-order-independent sum of a double column (exact decimal
    * accumulator, double result). Oracle side:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = scaledSum(c).cast("double")

  /** Exact average, same contract as [[dsum]]. Oracle:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) / COUNT(x) AS DOUBLE)` — the
    * single division happens on the exact decimal total on both sides
    * ([[scaledSum]] lands on the same decimal(28,4) operand type the
    * plain decimal sum had, so the division semantics are unchanged). */
  def davg(c: Column): Column =
    (scaledSum(c) / count(c)).cast("double")

  /** First 15 hex chars of md5 as a non-negative long (60 bits — fits a
    * signed 64-bit on both engines; 16 chars could overflow DuckDB's
    * signed cast). Oracle: `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Spread a SINGLE-SPLIT scan across the session's shuffle width
    * before a genuinely CPU-bound per-row stage.
    *
    * The harness parquet files are one row group → one scan partition,
    * so a narrow pipeline (regex scrub, per-token md5, JSON parse,
    * wide decimal agg) runs on 1 of 32 cores; DuckDB parallelizes
    * INSIDE a row group and wins by default on exactly these queries.
    * One narrow exchange of the pruned input unlocks the other 31
    * cores — use it ONLY where the stage's measured single-thread cost
    * exceeds the shuffle's (the round-4 k2 regression was this helper
    * applied to a stage that wasn't CPU-bound). The width is pinned via
    * an explicit key column because AQE coalesces an expression-only
    * repartition of MB-sized data straight back to one partition. At
    * 100 TB every real input arrives multi-split and this exchange
    * disappears; it models the parallelism the scan would already have.
    */
  def spread(df: org.apache.spark.sql.DataFrame, key: Column): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, key)

  /** Presentation sort for a COMPARE-SURFACE result: identical global
    * order to `orderBy(keys)`, materialized once.
    *
    * A plain `orderBy` plans a range Exchange whose RangePartitioner
    * SAMPLES the child first — the entire query is computed twice, once
    * for the reservoir sample and once for real (measured: tx4 0.76 s
    * with orderBy, 0.30 s without, 0.38 s this way). Compared outputs
    * here are small (≤ ~100k rows — they are the DUMP, not the data),
    * so shuffling them to one partition and sorting there is strictly
    * cheaper than sampling + 32 range partitions, and it keeps the
    * byte-stable global order the determinism contract promises.
    * Production pipelines drop presentation sorts entirely (SCALE.md);
    * a BIG sorted result at 100 TB is `orderBy`'s range sort or a
    * write-time `sortBy` bucketing — never a single-partition sort. */
  def presented(df: org.apache.spark.sql.DataFrame, keys: Column*): org.apache.spark.sql.DataFrame =
    df.repartition(1).sortWithinPartitions(keys: _*)
}
