package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import graft.functions.{BloomBuildAgg, BloomMightContain}
import graft.operators.ApproxOps
import graft.sources.Tables

/** Contracts for the AP3 runtime-filter pair: a Bloom filter may lie
  * "maybe" but never "no" for an inserted key, the distributed build is
  * bit-identical to a serial one (bitwise-OR merge of fixed bitmaps),
  * and the probe really prunes. */
class BloomSketchSpec extends SparkSpec {

  private def buildBytes(df: org.apache.spark.sql.DataFrame,
      key: String): Array[Byte] =
    df.agg(column(BloomBuildAgg(expression(col(key)), 1L << 16, 0.03)
      .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives: every inserted key probes true") {
    val build = Tables.orders(spark, Sf)
      .filter(col("o_totalprice") > ApproxOps.BloomPriceMin)
      .select(col("o_custkey"))
    val bytes = buildBytes(build, "o_custkey")
    val misses = build.filter(!column(BloomMightContain(
      expression(lit(bytes)), expression(col("o_custkey"))))).count()
    assert(misses == 0)
  }

  test("distributed build is bit-identical to a serial build") {
    val build = Tables.orders(spark, Sf).select(col("o_custkey"))
    val spreadBytes = buildBytes(build.repartition(8), "o_custkey")
    val serialBytes = buildBytes(build.coalesce(1), "o_custkey")
    assert(java.util.Arrays.equals(spreadBytes, serialBytes))
  }

  test("probe prunes most non-members at fpp=3%") {
    val build = Tables.orders(spark, Sf)
      .filter(col("o_totalprice") > ApproxOps.BloomPriceMin)
      .select(col("o_custkey"))
    val bytes = buildBytes(build, "o_custkey")
    val customers = Tables.customer(spark, Sf)
    val total = customers.count()
    val pass = customers.filter(column(BloomMightContain(
      expression(lit(bytes)), expression(col("c_custkey"))))).count()
    val trueMembers = customers
      .join(build.distinct().withColumnRenamed("o_custkey", "c_custkey"),
        Seq("c_custkey"), "left_semi").count()
    assert(pass >= trueMembers, "bloom dropped a true member")
    // false positives among the (total - trueMembers) non-members stay
    // well under 5x the built fpp (3%) — generous against variance
    assert(pass - trueMembers <= math.max(5, (total - trueMembers) * 0.15),
      s"pass=$pass true=$trueMembers total=$total")
  }

  test("codegen and interpreted probes agree (incl. null key)") {
    val build = Tables.orders(spark, Sf).limit(50).select(col("o_custkey"))
    val bytes = buildBytes(build, "o_custkey")
    val probeExpr = BloomMightContain(
      expression(lit(bytes)), expression(col("c_custkey")))
    // codegen path: whole-stage filter over the customer scan
    val viaPlan = Tables.customer(spark, Sf)
      .select(col("c_custkey"), column(probeExpr).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // interpreted path: Expression.eval on a literal-bound copy
    val filter = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    viaPlan.foreach { case (k, hit) =>
      assert(hit == filter.mightContainLong(k), s"key $k")
    }
    // null bloom → null result (both paths)
    val nullExpr = BloomMightContain(
      expression(lit(null).cast("binary")), expression(col("c_custkey")))
    val nullRows = Tables.customer(spark, Sf).limit(3)
      .select(column(nullExpr).as("hit")).collect()
    assert(nullRows.forall(_.isNullAt(0)))
  }

  test("SQL surface: bloom_build + bloom_might_contain round-trip") {
    GraftExtensions.register(spark)
    Tables.orders(spark, Sf).createOrReplaceTempView("bs_orders")
    val bytes = spark.sql(
      "SELECT bloom_build(o_custkey, 65536, 0.03D) FROM bs_orders")
      .head().getAs[Array[Byte]](0)
    val hex = bytes.map("%02X".format(_)).mkString
    val n = spark.sql(
      s"SELECT count(*) FROM bs_orders WHERE bloom_might_contain(X'$hex', o_custkey)")
      .head().getLong(0)
    assert(n == Tables.orders(spark, Sf).count(), "SQL probe missed an inserted key")
  }
}
