package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.ScanOps

/** S8's change-data-feed bound as a streaming monitor: `foreachBatch`
  * advances a compacted latest-per-key state with each micro-batch and
  * emits the I/U/D feed against the PREVIOUS snapshot (the same
  * two-frame cores the registered batch query composes —
  * `ScanOps.{advanceState, snapshotDiffAgainst}` — so the monitor and
  * the batch feed can't drift). Planted inserts/updates/deletes must
  * land in their batch's feed, and a LATE event older than a key's
  * tombstone must NOT resurrect it (the associativity property
  * `stateOf` keeps tombstones for). */
object StreamingCdfSpec {
  case class Ev(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: java.lang.Double)
}

class StreamingCdfSpec extends SparkSpec {
  import StreamingCdfSpec.Ev

  test("CDF monitor: planted I/U/D land in their batch; tombstones survive late arrivals") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    // (batch, user, op, old_state, new_state, new_value)
    val feed = new scala.collection.mutable.ArrayBuffer[(Long, Long, String, String, String, java.lang.Double)]
    var state: DataFrame = ScanOps.stateOf(Seq.empty[Ev].toDF())
    val q = in.toDF().writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // localCheckpoint: the carried state must outlive this batch's
        // plan (a MemoryStream batch frame is only valid in-batch)
        val next = ScanOps.advanceState(state, batch).localCheckpoint()
        val rows = ScanOps.snapshotDiffAgainst(
          ScanOps.visibleState(state), ScanOps.visibleState(next)).collect()
        feed.synchronized {
          rows.foreach { r =>
            feed += ((id, r.getAs[Long]("user_id"), r.getAs[String]("op"),
              r.getAs[String]("old_state"), r.getAs[String]("new_state"),
              r.getAs[java.lang.Double]("new_value")))
          }
        }
        state = next
        ()
      }
      .start()
    try {
      // batch 0: two fresh keys
      in.addData(Ev(1, 10, 1, "click", 1.0), Ev(2, 11, 2, "view", 2.0))
      q.processAllAvailable()
      // batch 1: u1 updates, u2 tombstones (D), u3 inserts
      in.addData(Ev(3, 20, 1, "view", 3.0), Ev(4, 21, 2, "error", null),
        Ev(5, 22, 3, "click", 4.0))
      q.processAllAvailable()
      // batch 2: LATE events — u2's predates its tombstone (must stay
      // deleted, no feed row), u1's predates its current row (no-op)
      in.addData(Ev(6, 15, 2, "view", 9.0), Ev(7, 12, 1, "click", 8.0))
      q.processAllAvailable()
      // batch 3: u2 genuinely returns after the tombstone
      in.addData(Ev(8, 30, 2, "click", 5.0))
      q.processAllAvailable()
      val byBatch = feed.groupBy(_._1)
      assert(byBatch(0L).map(t => (t._2, t._3, t._6)).toSet ===
        Set((1L, "I", 1.0: java.lang.Double), (2L, "I", 2.0: java.lang.Double)))
      assert(byBatch(1L).map(t => (t._2, t._3)).toSet ===
        Set((1L, "U"), (2L, "D"), (3L, "I")))
      assert(byBatch(1L).find(_._2 == 1L).get._5 === "view")
      assert(!byBatch.contains(2L),
        s"late arrivals resurrected state or re-fed an unchanged key: ${byBatch.get(2L)}")
      assert(byBatch(3L).map(t => (t._2, t._3, t._6)).toSet ===
        Set((2L, "I", 5.0: java.lang.Double)))
    } finally q.stop()
  }

  test("monitor state transition equals the batch query's two-cutoff rule") {
    import spark.implicits._
    // the SAME event log read two ways: all-at-once with a cutoff
    // (batch s8's stateAt) vs accumulated batch-by-batch through
    // advanceState — the compaction must agree on every key
    val log = Seq(
      Ev(1, 10, 1, "click", 1.0), Ev(2, 12, 2, "view", 2.0),
      Ev(3, 14, 1, "error", null), Ev(4, 16, 3, "click", 3.0),
      Ev(5, 11, 2, "click", 9.0), // late within the log
      Ev(6, 18, 1, "view", 4.0))
    val batched = log.grouped(2).toSeq
    var state = ScanOps.stateOf(Seq.empty[Ev].toDF())
    batched.foreach { b => state = ScanOps.advanceState(state, b.toDF()) }
    val streamed = ScanOps.visibleState(state)
      .orderBy("user_id").collect().toSeq
    val direct = ScanOps.visibleState(ScanOps.stateOf(log.toDF()))
      .orderBy("user_id").collect().toSeq
    assert(streamed === direct)
  }
}
