package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.streaming.MicroBatcher
import graft.streaming.MicroBatcher.{Packet, Rec}

/** SURVEY §5.4 — stateful streaming G2 (count-OR-timeout) + in-buffer
  * G3 dedup, driven by MemoryStream (not oracle-checkable: processing
  * time).
  *
  * NOTE: with `ProcessingTimeTimeout`, `processAllAvailable()` can spin
  * forever (timer-only batches keep making new work "available"), so the
  * harness polls the memory sink against a deadline instead.
  */
object MicroBatcherSpec {
  /** Static fake clock: statics are shared across local-mode task
    * closures, unlike captured vars (serialized by value per task). */
  val FakeClock = new java.util.concurrent.atomic.AtomicLong(0L)
}

class MicroBatcherSpec extends SparkSpec {

  private def startQuery(in: MemoryStream[Rec], batchSize: Int,
      timeoutMs: Long): StreamingQuery =
    MicroBatcher(in.toDS(), batchSize, timeoutMs)
      .writeStream.format("memory")
      .queryName("mb_out_" + System.nanoTime())
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(50))
      .start()

  /** Poll the memory sink until `enough` holds or the deadline passes. */
  private def pollUntil(q: StreamingQuery, deadlineMs: Long)(
      enough: Seq[Packet] => Boolean): Seq[Packet] = {
    import spark.implicits._
    val deadline = System.currentTimeMillis() + deadlineMs
    var out = Seq.empty[Packet]
    while (System.currentTimeMillis() < deadline &&
        { out = spark.table(q.name).as[Packet].collect().toSeq; !enough(out) })
      Thread.sleep(100)
    out
  }

  private def run(recs: Seq[Rec], batchSize: Int, timeoutMs: Long,
      deadlineMs: Long = 30000L)(enough: Seq[Packet] => Boolean): Seq[Packet] = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Rec]
    val q = startQuery(in, batchSize, timeoutMs)
    try {
      in.addData(recs)
      pollUntil(q, deadlineMs)(enough)
    } finally q.stop()
  }

  private def rec(k: Int, i: Int) = Rec(k, s"K${k}_$i", s"p$i")

  test("count trigger: a burst drains in full batches, remainder buffered") {
    val out = run((0 until 25).map(rec(10, _)), batchSize = 10,
      timeoutMs = 600000L)(_.count(_.reason == "count") >= 2)
    assert(out.count(_.reason == "count") === 2)
    assert(out.filter(_.reason == "count").forall(_.size === 10))
    // the 5-row remainder is still waiting on its (10-minute) timer
    assert(!out.exists(_.reason == "timeout"))
  }

  test("timeout trigger: the remainder flushes after the timer fires") {
    val out = run((0 until 7).map(rec(11, _)), batchSize = 10,
      timeoutMs = 300L)(_.exists(_.reason == "timeout"))
    assert(out.exists(p => p.reason == "timeout" && p.size == 7))
  }

  test("in-buffer dedup: duplicate record keys collapse before batching") {
    val dupes = (0 until 30).map(i => rec(12, i % 10)) // 10 distinct keys
    val out = run(dupes, batchSize = 10, timeoutMs = 600000L)(
      _.count(_.reason == "count") >= 1)
    assert(out.count(_.reason == "count") === 1)
    assert(out.head.size === 10)
  }

  test("force flush: a remainder older than 2×timeout flushes on next input") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    MicroBatcherSpec.FakeClock.set(0L)
    val in = MemoryStream[Rec]
    val q = MicroBatcher(in.toDS(), batchSize = 10, timeoutMs = 600000L,
        clock = () => MicroBatcherSpec.FakeClock.get())
      .writeStream.format("memory")
      .queryName("mb_force_" + System.nanoTime())
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      in.addData(rec(20, 0), rec(20, 1))
      // wait until the first batch is actually processed at clock 0
      val d1 = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < d1 &&
        q.recentProgress.map(_.numInputRows).sum < 2) Thread.sleep(100)
      // oldest pending row is now "older" than 2×timeout on the fake clock
      MicroBatcherSpec.FakeClock.set(1300000L)
      in.addData(rec(20, 2))
      val out = pollUntil(q, 30000L)(_.exists(_.reason == "force"))
      assert(out.exists(p => p.reason == "force" && p.size == 3))
    } finally q.stop()
  }

  test("keys batch independently") {
    val mixed = (0 until 10).map(rec(13, _)) ++ (0 until 4).map(rec(14, _))
    val out = run(mixed, batchSize = 10, timeoutMs = 600000L)(
      _.exists(p => p.apiType == 13 && p.reason == "count"))
    assert(out.count(p => p.apiType == 13 && p.reason == "count") === 1)
    assert(!out.exists(p => p.apiType == 14)) // below count, timer pending
  }
}
