package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The contract behind `Common.scaledSum`'s long accumulator: per row,
  * `round(c·10⁴)` must equal the unscaled value of
  * `CAST(c AS DECIMAL(18,4))` — both are HALF_UP, but the former rounds
  * the double PRODUCT c·10⁴ while the latter rounds the decimal
  * expansion of c, so they could in principle disagree for a double
  * sitting within 1 ulp of a .00005 boundary. This spec pins agreement
  * over every column the query surface aggregates, at the harness SF —
  * the precondition for dsum/davg/j3's revenue staying bit-identical
  * to the DuckDB oracle's decimal restatement. */
class DecimalScaleSpec extends SparkSpec {

  private def assertScaledAgrees(df: DataFrame, c: Column): Unit = {
    val scaled = round(c * 10000).cast("long")
    val viaDecimal = (c.cast("decimal(18,4)") * 10000).cast("long")
    assert(df.filter(!(scaled <=> viaDecimal)).count() === 0)
  }

  test("round(c*1e4) == unscaled decimal(18,4) cast on every aggregated column") {
    val li = Tables.lineitem(spark, Sf)
    Seq("l_quantity", "l_extendedprice", "l_discount").foreach(c =>
      assertScaledAgrees(li, col(c)))
    assertScaledAgrees(li, lit(1.0) - col("l_discount"))
    assertScaledAgrees(Tables.orders(spark, Sf), col("o_totalprice"))
    assertScaledAgrees(Tables.events(spark, Sf), col("value"))
  }

  test("dsum via scaled long equals the plain decimal sum, bit for bit") {
    import graft.operators.Common.dsum
    val ev = Tables.events(spark, Sf)
    val both = ev.groupBy(col("event_type")).agg(
      dsum(col("value")).as("fast"),
      sum(col("value").cast("decimal(18,4)")).cast("double").as("exact"))
    assert(both.filter(!(col("fast") <=> col("exact"))).count() === 0)
  }
}
