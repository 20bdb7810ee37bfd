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

  test("dsum overflow past 2^63/10^4 group totals raises loudly, never wraps") {
    import graft.operators.Common.dsum
    import spark.implicits._
    // Spark 4 defaults to ANSI mode, under which the long accumulator
    // raises ARITHMETIC_OVERFLOW instead of silently wrapping — the
    // safety contract scaledSum's doc promises at the 100 TB domain
    // edge (three rows of 9e14: each scaled value fits a long, the
    // group total 2.7e19 does not)
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val huge = Seq(9e14, 9e14, 9e14).toDF("v")
    val e = intercept[Exception] { huge.agg(dsum($"v")).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("ARITHMETIC_OVERFLOW")))
    // sane domains are untouched
    assert(Seq(1.5, 2.25).toDF("v").agg(dsum($"v")).head().getDouble(0) === 3.75)
  }
}
