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
  /** Partition-order-independent sum of a double column (exact decimal
    * accumulator, double result). Oracle side:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact average, same contract as [[dsum]]. Oracle:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) / COUNT(x) AS DOUBLE)` — the
    * single division happens on the exact decimal total on both sides. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))) / count(c)).cast("double")

  /** First 15 hex chars of md5 as a non-negative long (60 bits — fits a
    * signed 64-bit on both engines; 16 chars could overflow DuckDB's
    * signed cast). Oracle: `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
