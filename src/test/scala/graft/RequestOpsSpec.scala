package graft

import org.apache.spark.sql.functions._
import graft.operators.RequestOps

/** SURVEY §5.2 — request-path operator invariants (T2-T5). */
class RequestOpsSpec extends SparkSpec {

  test("T2 explode: pos is a dense 0-based index per user") {
    val df = RequestOps.explode(spark, Sf)
    val bad = df.groupBy("user_id")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() === 0)
  }

  test("T3: valid and reject branches partition the input exactly") {
    val valid = RequestOps.validate(spark, Sf).select("event_id")
    val rejects = RequestOps.rejects(spark, Sf).select("event_id")
    val total = graft.sources.Tables.events(spark, Sf).count()
    assert(valid.count() + rejects.count() === total)
    assert(valid.intersect(rejects).count() === 0)
  }

  test("T3 rejects: error precedence is stax > sid > api_type") {
    // user_id%3==2 rows must always say "stax is null" regardless of sid
    val df = RequestOps.rejects(spark, Sf)
      .join(graft.sources.Tables.events(spark, Sf), "event_id")
    assert(df.filter(col("user_id") % 3 === 2 &&
      col("error_message") =!= "stax is null").count() === 0)
  }

  test("T5 backoff: UPDATE rows follow the 10·2^(n+1) schedule, capped at max retries") {
    // the reference increments retry_count BEFORE pow(2, retry_count)
    // (InvoiceRequestTransformer.java:128-133): stored count n → 2^(n+1)
    val df = RequestOps.retryBackoff(spark, Sf).cache()
    val sched = df.filter(col("tag") === "UPDATE")
      .select("retry_count", "next_retry_secs").distinct()
      .collect().map(r => r.getByte(0).toInt -> r.getLong(1)).toMap
    assert(sched === Map(0 -> 20L, 1 -> 40L, 2 -> 80L, 3 -> 160L))
    // MAX_RETRY iff retry_count > 3; dead-lettered rows carry no backoff
    assert(df.filter(col("retry_count") > 3 && col("tag") =!= "MAX_RETRY").count() === 0)
    assert(df.filter(col("tag") === "MAX_RETRY" &&
      col("next_retry_secs").isNotNull).count() === 0)
    df.unpersist()
  }
}
