package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S6's point-in-time snapshot as a STREAMING state table: the same
  * "latest event per user" contract, maintained incrementally by a
  * streaming max_by aggregation — the CDC materialized-view shape (the
  * reference's MySQL tables ARE this state, kept by upserts; Spark
  * keeps it as streaming aggregation state + a complete-mode sink).
  * Late rows revise the key's state only if newer — asserted equal to
  * the batch rule on the same rows. */
class StreamingSnapshotSpec extends SparkSpec {

  test("streaming latest-per-key equals the batch snapshot rule, late rows included") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long, String, Double, Long)]
    val ev = in.toDF()
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val cur = ev.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value"), col("ts")),
        // same total order as the batch rule: ts desc, event_id desc
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"), col("last.ts").as("last_ts"))
    val q = cur.writeStream.format("memory")
      .queryName("snapshot_state").outputMode("complete").start()
    try {
      in.addData(
        (1L, 7L, "click", 1.0, 100L),
        (2L, 7L, "view", 2.0, 200L),
        (3L, 8L, "click", 3.0, 150L))
      q.processAllAvailable()
      in.addData(
        (4L, 7L, "error", 4.0, 50L),   // LATE for user 7 — must not win
        (5L, 8L, "purchase", 5.0, 160L), // newer for user 8 — wins
        (6L, 9L, "signup", 6.0, 10L))
      q.processAllAvailable()
      val state = spark.table("snapshot_state").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("last_event_id"), r.getAs[String]("last_type")))
        .toMap
      assert(state == Map(
        7L -> (2L, "view"),      // late event 4 did not displace it
        8L -> (5L, "purchase"),
        9L -> (6L, "signup")))
    } finally q.stop()
  }
}
