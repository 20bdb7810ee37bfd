package graft

import org.apache.spark.sql.functions._
import graft.operators.AggOps
import graft.sources.Tables

/** A2-A4 structural invariants (values are oracle-checked by the
  * driver; these pin the grouping-set shape). */
class AggOpsSpec extends SparkSpec {

  test("A2 rollup: levels partition the data; grand total row matches table count") {
    val r = AggOps.rollupAgg(spark, Sf).cache()
    val total = Tables.lineitem(spark, Sf).count()
    // every level re-aggregates to the full row count
    Seq(0, 1).foreach { gl =>
      assert(r.filter(col("gl") === gl).agg(sum("n_items")).head().getLong(0) === total)
    }
    val grand = r.filter(col("gl") === 3)
    assert(grand.count() === 1)
    assert(grand.head().getAs[Long]("n_items") === total)
    assert(grand.head().isNullAt(grand.columns.indexOf("l_returnflag")))
    // rollup ≠ cube: no (null, status) level
    assert(r.filter(col("gl") === 2).count() === 0)
    r.unpersist()
  }

  test("A3 cube: all four grouping sets present") {
    val c = AggOps.cubeAgg(spark, Sf).cache()
    assert(c.select("gl").distinct().collect().map(_.getInt(0)).sorted
      === Array(0, 1, 2, 3))
    val total = Tables.orders(spark, Sf).count()
    Seq(0, 1, 2, 3).foreach { gl =>
      assert(c.filter(col("gl") === gl).agg(sum("n_orders")).head().getLong(0) === total)
    }
    c.unpersist()
  }

  test("A4 pivot: fixed column set; row sums equal the unpivoted sums") {
    val p = AggOps.pivotAgg(spark, Sf)
    assert(p.columns.toSeq === ("cohort" +: AggOps.EventTypes))
    val pivotTotal = p.select(
      AggOps.EventTypes.map(t => coalesce(sum(col(t)), lit(0.0))).reduce(_ + _).as("s"))
      .head().getDouble(0)
    val direct = Tables.events(spark, Sf)
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double")).head().getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }
}
