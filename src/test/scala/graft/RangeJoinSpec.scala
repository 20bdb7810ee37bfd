package graft

import org.apache.spark.sql.functions._
import graft.operators.{JoinOps, ScanOps}

/** JX6 invariant: the bucketed range join returns EXACTLY the naive
  * inequality join's pairs (which Spark plans as BroadcastNestedLoop —
  * correct, quadratic per key, the thing the bucketing replaces). */
class RangeJoinSpec extends SparkSpec {

  test("bucketed range join == naive BNLJ range join, and never plans BNLJ itself") {
    val ev = ScanOps.eventsTs(spark, Sf)
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("l_event_id"), col("user_id"), col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("win_end"))
    val naive = l.join(r, col("user_id") === col("r_user") &&
        col("l_ts") >= col("win_start") && col("l_ts") < col("win_end"))
      .select(col("l_event_id"), col("r_event_id"))
    val bucketed = JoinOps.rangeBucketed(spark, Sf)
      .select(col("l_event_id"), col("r_event_id"))
    assert(naive.exceptAll(bucketed).count() === 0)
    assert(bucketed.exceptAll(naive).count() === 0)
    assert(bucketed.count() > 0) // non-vacuous at sf0.001
    val plan = JoinOps.rangeBucketed(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucketing must yield an equi-join")
  }
}
