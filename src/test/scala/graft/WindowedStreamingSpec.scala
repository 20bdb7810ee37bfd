package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming binding of the W2/W4 window family: the SAME
  * `window()` / `session_window()` group keys as the batch
  * oracle-checked queries, under a watermark in append mode —
  * finalized-window emission and late-data drop are the semantics the
  * batch form can't exercise. Watermark-only aggregations have no
  * processing-time timers, so `processAllAvailable()` is safe here
  * (unlike the MicroBatcher's ProcessingTimeTimeout). */
class WindowedStreamingSpec extends SparkSpec {

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("W2 streaming: watermark finalizes tumbling windows and drops late rows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val q = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("w.start").as("win_start"), col("n"), col("sv"))
      .writeStream.format("memory")
      .queryName("w2_stream_" + System.nanoTime())
      .outputMode("append")
      .start()
    try {
      // hour-0 rows; nothing can emit yet (watermark at 0)
      in.addData((ts(10), 1.0), (ts(20), 2.0))
      q.processAllAvailable()
      assert(spark.table(q.name).count() === 0)
      // watermark → 65-10 = 55 < 60: hour-0 window still open
      in.addData((ts(65), 4.0))
      q.processAllAvailable()
      assert(spark.table(q.name).count() === 0)
      // watermark → 80-10 = 70 ≥ 60: hour-0 finalizes with BOTH rows
      in.addData((ts(80), 8.0))
      q.processAllAvailable()
      val h0 = spark.table(q.name).collect()
      assert(h0.length === 1)
      assert(h0(0).getAs[Long]("n") === 2)
      assert(h0(0).getAs[Double]("sv") === 3.0)
      // a row at minute 5 is behind the watermark (70): dropped, not
      // re-emitted, and absent from any later window
      in.addData((ts(5), 100.0))
      q.processAllAvailable()
      assert(spark.table(q.name).count() === 1)
      // watermark → 190-10 = 180 ≥ 120: hour-1 finalizes WITHOUT the late row
      in.addData((ts(190), 16.0))
      q.processAllAvailable()
      val rows = spark.table(q.name).orderBy(col("win_start")).collect()
      assert(rows.length === 2)
      assert(rows(1).getAs[Long]("n") === 2) // 65 and 80 only
      assert(rows(1).getAs[Double]("sv") === 12.0)
    } finally q.stop()
  }

  test("stream-stream interval join: matches inside the window, state evicted past watermark") {
    // the streaming form of the J-family equi-joins: two watermarked
    // streams, equi-key plus an event-time range — Spark buffers each
    // side ONLY until the combined watermark passes the interval bound,
    // which is what makes the join runnable on unbounded inputs
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // NOT the shared ts(): an event at exactly epoch 0 equals the join's
    // INITIAL watermark and is filtered as late before reaching state
    // (boundary is inclusive on the join input path) — shift the clock
    def ts(min: Long) = new java.sql.Timestamp((120 + min) * 60000L)
    val impIn = MemoryStream[(Long, java.sql.Timestamp)]
    val clkIn = MemoryStream[(Long, java.sql.Timestamp)]
    val imp = impIn.toDF().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "1 minute")
    val clk = clkIn.toDF().toDF("c_ad_id", "clk_ts")
      .withWatermark("clk_ts", "1 minute")
    val q = imp.join(clk, expr(
        """ad_id = c_ad_id AND
          |clk_ts >= imp_ts AND
          |clk_ts <= imp_ts + interval 10 minutes""".stripMargin))
      .select(col("ad_id"), col("imp_ts"), col("clk_ts"))
      .writeStream.format("memory")
      .queryName("ssj_out_" + System.nanoTime())
      .outputMode("append")
      .start()
    try {
      impIn.addData((1L, ts(0)), (2L, ts(5)))
      clkIn.addData((1L, ts(4)), (2L, ts(20))) // 4 ∈ [0,10]; 20 ∉ [5,15]
      q.processAllAvailable()
      val first = spark.table(q.name).collect()
      assert(first.length === 1)
      assert(first(0).getAs[Long]("ad_id") === 1L)
      // advance BOTH watermarks far past the interval bound → buffered
      // impression state is evicted
      impIn.addData((99L, ts(100)))
      clkIn.addData((98L, ts(100)))
      q.processAllAvailable()
      // a click for ad 2 that WOULD match (ts 6 ∈ [5,15]) arrives behind
      // the watermark: dropped, no late match materializes
      clkIn.addData((2L, ts(6)))
      q.processAllAvailable()
      assert(spark.table(q.name).count() === 1)
    } finally q.stop()
  }

  test("W4 streaming: session windows merge within the gap and emit on watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n"))
      .writeStream.format("memory")
      .queryName("w4_stream_" + System.nanoTime())
      .outputMode("append")
      .start()
    try {
      // user 1: two events 20 min apart → one session; user 2: isolated
      in.addData((1L, ts(0)), (1L, ts(20)), (2L, ts(5)))
      q.processAllAvailable()
      // push the watermark past every session's end (50 + 10 lag)
      in.addData((9L, ts(120)))
      q.processAllAvailable()
      val rows = spark.table(q.name).filter(col("user_id") < 9)
        .orderBy(col("user_id")).collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n") === 2) // user 1 merged
      assert(rows(0).getAs[java.sql.Timestamp]("sess_end").getTime === ts(50).getTime)
      assert(rows(1).getAs[Long]("n") === 1) // user 2 alone
    } finally q.stop()
  }
}
