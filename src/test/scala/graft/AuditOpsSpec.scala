package graft

import org.apache.spark.sql.functions._
import graft.operators.AuditOps
import graft.sources.Tables

/** dq1 contract: every declared constraint reports against the right
  * row universe, counters agree with independently-computed values,
  * and the pass flag is exactly n_violations == 0. */
class AuditOpsSpec extends SparkSpec {

  test("dq1: constraint rows, universes and independent counter checks") {
    val rows = AuditOps.constraints(spark, Sf).collect()
      .map(r => r.getAs[String]("constraint_name") -> r).toMap
    assert(rows.size == 8)
    val nEvents = Tables.events(spark, Sf).count()
    val nOrders = Tables.orders(spark, Sf).count()
    val nLi = Tables.lineitem(spark, Sf).count()
    assert(rows.keys.count(_.startsWith("events.")) == 4)
    rows.foreach { case (name, r) =>
      val expected =
        if (name.startsWith("events.")) nEvents
        else if (name.startsWith("orders.")) nOrders else nLi
      assert(r.getAs[Long]("n_rows") == expected, name)
      assert((r.getAs[Int]("pass") == 1) == (r.getAs[Long]("n_violations") == 0L), name)
    }
    // independent recomputations
    val dupIds = nEvents -
      Tables.events(spark, Sf).select(col("event_id")).distinct().count()
    assert(rows("events.event_id_unique").getAs[Long]("n_violations") == dupIds)
    val orphans = Tables.orders(spark, Sf)
      .join(Tables.customer(spark, Sf)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .filter(col("o_custkey").isNotNull).count()
    assert(rows("orders.o_custkey_in_customer").getAs[Long]("n_violations") == orphans)
    val badQty = Tables.lineitem(spark, Sf)
      .filter(col("l_quantity") <= 0).count()
    assert(rows("lineitem.l_quantity_positive").getAs[Long]("n_violations") == badQty)
  }
}
