package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.MicroBatcher.Rec
import graft.streaming.MicroBatcherV2

/** G2 on the transformWithState API (MicroBatcherV2): count-path
  * flushes, buffer dedup, and packet identity — on the RocksDB state
  * store the API requires. Timer-path behavior is deadline-polled (a
  * ProcessingTime timer query can keep processAllAvailable spinning —
  * same gotcha as the v1 MicroBatcher). */
class MicroBatcherV2Spec extends SparkSpec {

  test("count path: full packets flush immediately, remainder stays buffered") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    withRocksDBStateStore {
      val in = MemoryStream[Rec]
      val q = MicroBatcherV2(in.toDS(), batchSize = 3, timeoutMs = 600000L)
        .writeStream.format("memory")
        .queryName("mb2_out_" + System.nanoTime())
        .outputMode("append")
        .start()
      // the pending-remainder timer makes processAllAvailable spin on
      // timer-only batches (see class doc) — poll the sink instead
      def awaitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (System.currentTimeMillis() < deadline &&
          spark.table(q.name).count() < n) Thread.sleep(200)
      }
      try {
        in.addData(
          (0 until 6).map(i => Rec(10, s"K10_$i", s"p$i")) ++
            (0 until 3).map(i => Rec(12, s"K12_$i", s"q$i")) :+
            Rec(12, "K12_extra", "q_extra") :+
            Rec(12, "K12_extra", "dup_of_extra")) // within-buffer dedup
        awaitRows(3)
        val out = spark.table(q.name)
        // 2 full packets for key 10, 1 for key 12; the extra row waits
        assert(out.count() === 3)
        assert(out.filter(col("apiType") === 10).count() === 2)
        assert(out.filter(col("size") =!= 3).count() === 0)
        assert(out.filter(col("reason") =!= "count").count() === 0)
        // packet identity: distinct (apiType, seq)
        assert(out.select("apiType", "seq").distinct().count() === 3)
        // second burst for key 10 continues the seq, doesn't restart it
        in.addData((6 until 9).map(i => Rec(10, s"K10_$i", s"p$i")): _*)
        awaitRows(4)
        val seqs = spark.table(q.name).filter(col("apiType") === 10)
          .select("seq").collect().map(_.getLong(0)).sorted
        assert(seqs === Array(0L, 1L, 2L))
      } finally q.stop()
    }
  }

  test("timer path: remainder flushes with reason=timeout") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    withRocksDBStateStore {
      val in = MemoryStream[Rec]
      val q = MicroBatcherV2(in.toDS(), batchSize = 100, timeoutMs = 1500L)
        .writeStream.format("memory")
        .queryName("mb2_t_out_" + System.nanoTime())
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
        .start()
      try {
        in.addData(Rec(11, "K11_0", "r0"), Rec(11, "K11_1", "r1"))
        val deadline = System.currentTimeMillis() + 30000
        while (System.currentTimeMillis() < deadline &&
          spark.table(q.name).isEmpty) Thread.sleep(200)
        val rows = spark.table(q.name).collect()
        assert(rows.length === 1)
        assert(rows(0).getAs[String]("reason") === "timeout")
        assert(rows(0).getAs[Int]("size") === 2)
      } finally q.stop()
    }
  }
}
