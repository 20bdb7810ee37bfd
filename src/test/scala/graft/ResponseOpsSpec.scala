package graft

import org.apache.spark.sql.functions._
import graft.operators.ResponseOps

/** SURVEY §5.2 — response-path operator invariants (T6-T9, G1-G4, R2). */
class ResponseOpsSpec extends SparkSpec {

  test("T7 sniff: every record classifies, and InvIn sniffing is exact") {
    val df = ResponseOps.sniff(spark, Sf)
    assert(df.filter(!col("sniffed_kind").isin("InvIn", "InvOut", "unknown"))
      .count() === 0)
    // ground-truth kind is user parity; all InvIn payloads carry fpt_* keys
    val joined = df.join(ResponseOps.staging(spark, Sf), "id")
    assert(joined.filter(col("kind") === "InvIn" &&
      col("sniffed_kind") =!= "InvIn").count() === 0)
  }

  test("G2 buckets: every batch is capped at BatchSize and sizes sum to input") {
    val b = ResponseOps.batchBuckets(spark, Sf).cache()
    assert(b.filter(col("cnt") > ResponseOps.BatchSize).count() === 0)
    // only the LAST bucket of a key may be partial
    val partialNonLast = b.as("x").join(
      b.groupBy(col("batch_key").as("k")).agg(max("batch_id").as("last")),
      col("batch_key") === col("k"))
      .filter(col("cnt") < ResponseOps.BatchSize && col("batch_id") =!= col("last"))
    assert(partialNonLast.count() === 0)
    b.unpersist()
  }

  test("G3 dedup: output keys are unique and keep the lowest id") {
    val d = ResponseOps.dedup(spark, Sf)
    assert(d.groupBy("kind", "dup_id").count().filter(col("count") > 1)
      .count() === 0)
  }

  test("T8 items: InvIn default message fills only when res_msg is absent") {
    val df = ResponseOps.items(spark, Sf)
    assert(df.filter(col("res_resource") === "fpt" &&
      col("message") === "Tạo mới thành công" &&
      col("status") =!= "success").count() === 0)
  }

  test("R2 routing: valid api_types map onto the 5 response topics, total") {
    val df = ResponseOps.topicRoute(spark, Sf)
    assert(df.filter(col("topic").isNull).count() === 0)
    assert(df.select("topic").distinct().count() === 5)
  }
}
